from mjlab_tpu.envs.manager_based_rl_env import (  # noqa: F401
    ManagerBasedRlEnv,
    ManagerBasedRlEnvCfg,
)
from mjlab_tpu.envs.types import VecEnvObs, VecEnvStepReturn  # noqa: F401
