from mjlab_tpu.scene.scene import Scene, SceneCfg  # noqa: F401
