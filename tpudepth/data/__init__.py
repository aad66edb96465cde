from tpudepth.data.nyu import (
    DATASET_LAYOUTS,
    NYUDepthDataset,
    DataLoader,
    get_testing_data,
    get_training_testing_data,
    load_zip_to_mem,
)
from tpudepth.data.synthetic import make_synthetic_kitti_zip, make_synthetic_zip

__all__ = [
    "DATASET_LAYOUTS",
    "NYUDepthDataset",
    "DataLoader",
    "get_testing_data",
    "get_training_testing_data",
    "load_zip_to_mem",
    "make_synthetic_kitti_zip",
    "make_synthetic_zip",
]
