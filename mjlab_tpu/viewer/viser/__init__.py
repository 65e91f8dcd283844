from mjlab_tpu.viewer.viser.viewer import ViserPlayViewer  # noqa: F401
