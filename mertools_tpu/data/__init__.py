from . import cv, dataset, feature_store, labels  # noqa: F401
from .dataset import FeatureDataset, epoch_plan  # noqa: F401
