from pathlib import Path

ASSET_ZOO_PATH = Path(__file__).parent
