from mjlab_tpu.rl.config import (  # noqa: F401
    RslRlBaseRunnerCfg,
    RslRlOnPolicyRunnerCfg,
    RslRlPpoActorCriticCfg,
    RslRlPpoAlgorithmCfg,
)
from mjlab_tpu.rl.runner import OnPolicyRunner  # noqa: F401
from mjlab_tpu.rl.vecenv_wrapper import RslRlVecEnvWrapper  # noqa: F401
