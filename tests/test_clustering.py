"""Distributed k-means: quantization contract, batching invariance."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_to_text_ray.stages import clustering


def _vec_table(seed: int, n: int = 120, d: int = 8) -> pa.Table:
    rng = np.random.RandomState(seed)
    # three well-separated blobs so the clustering is meaningful
    centers = np.array([[0.0] * d, [5.0] * d, [-5.0] * d])
    vecs = (
        centers[rng.randint(0, 3, n)] + rng.randn(n, d) * 0.3
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )


def test_quantize_matches_scalar_contract():
    t = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array(
                [[0.00048828125, -0.00048828125, 1.2, -1.2]],
                pa.list_(pa.float32()),
            ),
        }
    )
    q = clustering.quantize_batch(t)[0]
    # floor(x*1024 + 0.5) over the FLOAT32 value: exact .5 goes UP
    # (floor form), and 1.2f = 1.20000004... so +-1.2f quantize
    # asymmetrically (1229 / -1229) — the float32-exactness the SQL
    # CAST(e AS DOUBLE) twin reproduces
    assert list(q) == [1, 0, 1229, -1229]


def test_kmeans_invariant_to_block_layout():
    """Same assignments whatever the block structure — the partial
    sums merge exactly (integers), so parallelism can't change the
    result."""
    tbl = _vec_table(3)
    a = (
        clustering.kmeans(
            ray.data.from_arrow(tbl).repartition(1), k=4, iters=2
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        clustering.kmeans(
            ray.data.from_arrow(tbl).repartition(13), k=4, iters=2
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_kmeans_separates_blobs():
    tbl = _vec_table(9)
    out = clustering.kmeans(ray.data.from_arrow(tbl)).to_pandas()
    vecs = np.array(tbl["embedding"].to_pylist())
    blob = np.where(
        vecs.mean(1) > 2.0, 1, np.where(vecs.mean(1) < -2.0, 2, 0)
    )
    # every vector in a blob shares its blob-mates' cluster label
    for b in (0, 1, 2):
        labels = set(out[blob == b]["cluster"])
        assert len(labels) >= 1
        other = set(out[blob != b]["cluster"])
        assert labels.isdisjoint(other)


def test_kmeans_empty_table():
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    ds = clustering.kmeans(ray.data.from_arrow(empty))
    assert ds.count() == 0
    # (empty Dataset.to_pandas drops columns — a known Ray quirk the
    # oracle comparator rebuilds from ds.schema(); assert on schema)
    assert ds.schema().names == ["vec_id", "cluster", "dist"]


def test_hll_query_empty_token_corpus(tmp_path):
    """A corpus with no \\w+ token anywhere returns 0 rows (like the
    SQL oracle), instead of tripping the empty-Dataset column-loss
    quirk."""
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["", "   ..."], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["a", "b"], pa.string()),
            "n_chars": pa.array([0, 6], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from pdf_to_text_ray.pipelines.queries import QUERIES

    out = QUERIES["hll_distinct"](str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["source", "n_distinct", "hll_estimate"]
