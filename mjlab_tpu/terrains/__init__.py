from mjlab_tpu.terrains.importer import TerrainImporter, TerrainImporterCfg  # noqa: F401
