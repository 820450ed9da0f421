"""HyperLogLog sketch: rank extraction, merge semantics, accuracy."""

import numpy as np
import pyarrow as pa

from pdf_to_text_ray.functions.hashing import token_hashes64
from pdf_to_text_ray.stages import textstats


def test_hll_rho_trailing_zeros():
    v = np.array([0, 1, 2, 4, 6, 1 << 55], dtype=np.uint64)
    assert list(textstats.hll_rho(v)) == [57, 1, 2, 3, 2, 56]


def test_hll_partials_merge_invariant_to_batching():
    """max-merging per-batch partials == one-shot registers over the
    concatenated corpus (the mergeability the distributed groupby
    relies on)."""
    docs = [f"alpha beta{i} gamma delta{i % 7}" for i in range(50)]
    one = textstats.make_hll_partials()(
        pa.table({"source": ["s"] * 50, "text": docs})
    )

    def regs_of(tbl):
        m = np.zeros(textstats.HLL_REGISTERS, np.int64)
        for r, rho in zip(tbl["reg"].to_pylist(), tbl["rho"].to_pylist()):
            m[r] = max(m[r], rho)
        return m

    merged = np.zeros(textstats.HLL_REGISTERS, np.int64)
    for lo in range(0, 50, 7):
        part = textstats.make_hll_partials()(
            pa.table(
                {
                    "source": ["s"] * len(docs[lo : lo + 7]),
                    "text": docs[lo : lo + 7],
                }
            )
        )
        merged = np.maximum(merged, regs_of(part))
    assert (regs_of(one) == merged).all()


def test_hll_estimate_accuracy():
    """At n >> m the raw estimator should land within ~3 sigma
    (sigma = 1.04/sqrt(256) ~ 6.5%) of the true distinct count."""
    words = [f"w{i}x{i * 31}" for i in range(20_000)]
    h = token_hashes64(words)
    assert len(np.unique(h)) == len(words)
    reg = (h % np.uint64(256)).astype(np.int64)
    rho = textstats.hll_rho(h >> np.uint64(8))
    m = np.zeros(256, np.int64)
    np.maximum.at(m, reg, rho)
    est = textstats.hll_estimate(m)
    assert abs(est - 20_000) / 20_000 < 0.20


def test_hll_estimate_linear_counting_small_n():
    words = [f"tiny{i}" for i in range(30)]
    h = token_hashes64(words)
    reg = (h % np.uint64(256)).astype(np.int64)
    rho = textstats.hll_rho(h >> np.uint64(8))
    m = np.zeros(256, np.int64)
    np.maximum.at(m, reg, rho)
    est = textstats.hll_estimate(m)
    assert abs(est - 30) / 30 < 0.25
