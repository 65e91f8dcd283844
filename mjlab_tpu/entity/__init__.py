from mjlab_tpu.entity.entity import (  # noqa: F401
    Entity,
    EntityArticulationInfoCfg,
    EntityCfg,
    EntityIndexing,
)
from mjlab_tpu.entity.data import EntityData  # noqa: F401
