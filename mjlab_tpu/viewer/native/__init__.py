from mjlab_tpu.viewer.native.viewer import NativeMujocoViewer  # noqa: F401
