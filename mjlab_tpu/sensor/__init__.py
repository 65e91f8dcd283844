from mjlab_tpu.sensor.sensor import Sensor, SensorCfg  # noqa: F401
from mjlab_tpu.sensor.contact_sensor import (  # noqa: F401
    ContactData,
    ContactMatch,
    ContactSensor,
    ContactSensorCfg,
)
from mjlab_tpu.sensor.builtin_sensor import BuiltinSensor, BuiltinSensorCfg, ObjRef  # noqa: F401
