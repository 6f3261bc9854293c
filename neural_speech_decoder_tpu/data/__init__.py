from .batching import Batch, choose_envelope, eval_batches, sample_batch
from .dataset import PackedDataset, load_pickle_dataset, load_splits, pack_days
from .phonemes import MAX_SEQ_LEN, N_PHONES, PHONE_DEF, PHONE_DEF_SIL, id_to_phone, phone_to_id
from .synthetic import synthetic_dataset, synthetic_day

__all__ = [
    "Batch",
    "choose_envelope",
    "eval_batches",
    "sample_batch",
    "PackedDataset",
    "load_pickle_dataset",
    "load_splits",
    "pack_days",
    "MAX_SEQ_LEN",
    "N_PHONES",
    "PHONE_DEF",
    "PHONE_DEF_SIL",
    "id_to_phone",
    "phone_to_id",
    "synthetic_dataset",
    "synthetic_day",
]
