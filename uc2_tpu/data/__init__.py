"""Data layer exports (reference data/__init__.py:1-27 exposes DBs,
datasets, collators, samplers and loaders; same surface here)."""

from uc2_tpu.data.db import (DetectFeatDb, ImageDbGroup, RoutingImageDb,
                             SoftLabelDb, TxtTokDb, compute_num_bb,
                             get_ids_and_lens)
from uc2_tpu.data.store import StoreReader, StoreWriter
from uc2_tpu.data.collate import BucketSpec, collate_batch, default_buckets
from uc2_tpu.data.sampler import BucketBatcher
from uc2_tpu.data.loader import (MetaLoader, PrefetchLoader, TaskLoader,
                                 deterministic_task_schedule)
from uc2_tpu.data.datasets import (ConcatDataset, ItmDataset,
                                   ItmEvalDataset, ItmHardNegDataset,
                                   ItmRankDataset, ItmRankHardNegDataset,
                                   MlmDataset, MmxlmDataset,
                                   MmxlmSoftDataset, MrcDataset,
                                   MrfrDataset, MrmNceDataset,
                                   NegativeImageSampler, Nlvr2PairedDataset,
                                   Nlvr2TwoRowDataset, TlmDataset,
                                   VeDataset, VLDataset, VmlmDataset,
                                   VmlmSoftDataset, VqaDataset)
from uc2_tpu.data.labels import LabelVocab, default_label_vocab
