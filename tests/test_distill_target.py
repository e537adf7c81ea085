"""Pin the distillation-target construction behaviour (RESULTS.md ablation).

The exact-chain distillation target is the COUNTS of the (possibly
mitigation-resampled) training bits — a size-``shots_train`` multiset per
basis — not a continuous distribution. The measured target ablation
(RESULTS.md "distillation target ablation") found the resampled-counts
target wins partly because multiset resampling acts as *implicit
thresholding*: probability mass below ~1/shots_train is zeroed, sharpening
the target. These tests pin that behaviour so a quiet change to the target
construction (e.g. handing the chain the unresampled mitigated
distribution, or resampling at a different shot count) fails loudly instead
of silently shifting the distilled objective.

Reference context: the reference has no distillation at all (its sampler is
non-differentiable, ``RQC_dataset_building_phase/diffusion.py:53-80``); the
target convention is this framework's own and is fixed by measurement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ddqst_tpu import pipeline
from ddqst_tpu.config import get_preset
from ddqst_tpu.ops.mle import bits_to_counts
from ddqst_tpu.qsim import measure


def test_mitigated_resample_is_shots_train_multiset():
    """Mitigated training bits stay an exact shots_train-per-basis multiset.

    ``generate_training_data(mitigate_train_data=True)`` must RESAMPLE the
    cleaned distribution back to ``shots_train`` shots (pipeline.py:102-104)
    — the distillation target downstream is ``bits_to_counts`` of these
    bits, so per-basis target frequencies are quantised at 1/shots_train.
    """
    cfg = get_preset("special_states")
    cfg = cfg.replace(
        data=cfg.data.__class__(
            num_qubits=2, state_type="ghz", noise_type="readout",
            shots_train=64, mitigate_train_data=True,
        )
    )
    rng = np.random.default_rng(0)
    data = pipeline.generate_training_data(cfg, jax.random.key(0), rng)

    counts = np.asarray(bits_to_counts(data.bits))
    assert counts.shape == (9, 4)
    # Exact multiset: every basis holds exactly shots_train integer counts.
    np.testing.assert_array_equal(counts.sum(axis=-1), 64)
    freqs = counts / 64.0
    # Quantisation at 1/shots_train — no sub-shot probability mass.
    np.testing.assert_allclose(freqs * 64, np.round(freqs * 64), atol=1e-6)


def test_resampling_thresholds_subshot_mass():
    """Multiset resampling zeroes outcomes with mass << 1/shots.

    This is the "implicit thresholding" mechanism the target ablation
    credits: a distribution with eps-mass tails, resampled at S shots with
    S*eps << 1, drops the tail outcomes entirely with high probability,
    while the unresampled distribution keeps them. Fixed seed makes the
    check deterministic.
    """
    eps = 1e-4
    s = 256  # S*eps = 0.0256 expected tail shots per outcome
    probs = jnp.asarray([[0.5 - eps, 0.5 - eps, eps, eps]], jnp.float32)
    bits = measure.sample_bits(jax.random.key(3), probs, s, 2)
    counts = np.asarray(bits_to_counts(bits))[0]
    assert counts.sum() == s
    # The sub-shot outcomes vanish from the resampled target...
    assert counts[2] == 0 and counts[3] == 0
    # ...while the bulk outcomes keep their mass (binomial, ~0.5 each).
    assert counts[0] > 0.4 * s and counts[1] > 0.4 * s
