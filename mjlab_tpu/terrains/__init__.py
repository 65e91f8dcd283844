from mjlab_tpu.terrains.heightfield_terrains import (  # noqa: F401
    HfPyramidSlopedTerrainCfg,
    HfRandomUniformTerrainCfg,
    HfWaveTerrainCfg,
)
from mjlab_tpu.terrains.importer import TerrainImporter, TerrainImporterCfg  # noqa: F401
from mjlab_tpu.terrains.primitive_terrains import (  # noqa: F401
    BoxFlatTerrainCfg,
    BoxInvertedPyramidStairsTerrainCfg,
    BoxPyramidStairsTerrainCfg,
    BoxRandomGridTerrainCfg,
)
from mjlab_tpu.terrains.terrain_generator import (  # noqa: F401
    SubTerrainCfg,
    TerrainGenerator,
    TerrainGeneratorCfg,
    TerrainPatch,
)
