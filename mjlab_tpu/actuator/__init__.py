from mjlab_tpu.actuator.actuator import Actuator, ActuatorCfg, ActuatorCmd  # noqa: F401
from mjlab_tpu.actuator.builtin import (  # noqa: F401
    BuiltinMotorActuator,
    BuiltinMotorActuatorCfg,
    BuiltinPositionActuator,
    BuiltinPositionActuatorCfg,
    BuiltinVelocityActuator,
    BuiltinVelocityActuatorCfg,
)
from mjlab_tpu.actuator.pd import IdealPdActuator, IdealPdActuatorCfg  # noqa: F401
from mjlab_tpu.actuator.dc import DcMotorActuator, DcMotorActuatorCfg  # noqa: F401
from mjlab_tpu.actuator.delayed import DelayedActuator, DelayedActuatorCfg  # noqa: F401
from mjlab_tpu.actuator.learned import (  # noqa: F401
    LearnedMlpActuator,
    LearnedMlpActuatorCfg,
)
from mjlab_tpu.actuator.xml import (  # noqa: F401
    XmlMotorActuatorCfg,
    XmlPositionActuatorCfg,
    XmlVelocityActuatorCfg,
)
