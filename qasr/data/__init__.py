from qasr.data.batching import Batch, bucketed_batches, epoch_iterator, make_batch
from qasr.data.synthetic import SyntheticDataset
from qasr.data.timit import (
    FOLD_61_TO_39,
    PHONE_TO_ID,
    TIMIT_61,
    TimitDataset,
    fold_ids_to_39,
    fold_to_39,
    read_phn,
    read_sphere,
)

__all__ = [
    "Batch",
    "bucketed_batches",
    "epoch_iterator",
    "make_batch",
    "SyntheticDataset",
    "TimitDataset",
    "TIMIT_61",
    "FOLD_61_TO_39",
    "PHONE_TO_ID",
    "fold_to_39",
    "fold_ids_to_39",
    "read_phn",
    "read_sphere",
]
