"""Dataset building, record schema, and loaders for RQC tomography data."""

from ddqst_tpu.data.records import (  # noqa: F401
    CircuitRecord,
    save_shard,
    load_shard,
    load_dataset,
)
from ddqst_tpu.data.generate import (  # noqa: F401
    build_dataset,
    build_dataset_chunked,
)
from ddqst_tpu.data.loader import (  # noqa: F401
    dataset_to_training_arrays,
    counts_to_bits_exact,
)
