from mjlab_tpu.utils.wrappers.video_recorder import VideoRecorder  # noqa: F401
