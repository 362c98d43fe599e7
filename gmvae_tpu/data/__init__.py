"""Datasets: host-side fetch once, everything else on device.

Reference behavior (SURVEY.md §1.1, BASELINE.json:5): per-dataset loaders that
normalize, dynamically binarize, shuffle, and batch. TPU-native redesign: the
host only materializes the raw uint8 arrays ONCE; normalization, dynamic
binarization (fresh Bernoulli mask per step, threefry-keyed) and batch
selection are jitted XLA transforms on device-resident data, so the training
hot loop does zero host work (SURVEY.md §7.3 hard part #4).

Source order per dataset: local npz (``$GMVAE_DATA_DIR``), keras cache,
network download via ``tf.keras.datasets`` (gated — this environment has no
egress), and finally a deterministic synthetic fallback so training never
hard-requires a download (SURVEY.md §7.1).
"""

from gmvae_tpu.data.loaders import Dataset, load, make_synthetic
from gmvae_tpu.data.preprocess import (dynamic_binarize, epoch_batch_indices,
                                       normalize_image, preprocess_batch)

__all__ = [
    'Dataset', 'load', 'make_synthetic', 'preprocess_batch',
    'dynamic_binarize', 'normalize_image', 'epoch_batch_indices',
]
