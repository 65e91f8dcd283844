from mjlab_tpu.asset_zoo.robots.unitree_g1.g1_constants import (  # noqa: F401
    G1_ACTION_SCALE,
    get_g1_robot_cfg,
)
from mjlab_tpu.asset_zoo.robots.unitree_go1.go1_constants import (  # noqa: F401
    GO1_ACTION_SCALE,
    get_go1_robot_cfg,
)
