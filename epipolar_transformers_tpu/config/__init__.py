from .schema import (
    BackboneConfig,
    Config,
    DataloaderConfig,
    DatasetsConfig,
    EpipolarConfig,
    H36MConfig,
    KeypointConfig,
    LiftingConfig,
    PictStructConfig,
    SolverConfig,
    TestConfig,
    VisConfig,
    update_from_dict,
)
from .loader import load_config
from .catalog import BackboneCatalog, DatasetCatalog

__all__ = [
    "Config",
    "BackboneConfig",
    "LiftingConfig",
    "KeypointConfig",
    "EpipolarConfig",
    "PictStructConfig",
    "DatasetsConfig",
    "DataloaderConfig",
    "SolverConfig",
    "TestConfig",
    "VisConfig",
    "H36MConfig",
    "update_from_dict",
    "load_config",
    "DatasetCatalog",
    "BackboneCatalog",
]
