from mjlab_tpu.viewer.base import BaseViewer, EnvProtocol, PolicyProtocol  # noqa: F401
from mjlab_tpu.viewer.debug_visualizer import (  # noqa: F401
    DebugVisualizer,
    NullDebugVisualizer,
)
from mjlab_tpu.viewer.offscreen_renderer import OffscreenRenderer  # noqa: F401
from mjlab_tpu.viewer.viewer_config import ViewerConfig  # noqa: F401
