"""Dataset layer: host-side numpy loaders with the reference's batch
contract, plus the offline synthesis/preprocessing pipelines."""

from .datasets import (  # noqa: F401
    ASAPDataset, DataLoader, SyntheticTestDataset, SyntheticTrainDataset,
    collate, load_time_signatures)
