"""On-device sampler tests: membership correctness, never-a-positive
guarantee, epoch batch shapes (reference contract: deepRecommender.py:29-77)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu.ops import sampling as S


@pytest.fixture
def csr():
    # 4 users over 10 items
    rows = {
        0: [1, 3, 5],
        1: [0, 2, 4, 6, 8],
        2: [9],
        3: [],
    }
    indices, indptr = [], [0]
    for u in range(4):
        indices.extend(rows[u])
        indptr.append(len(indices))
    return (
        jnp.asarray(np.array(indices, dtype=np.int32)),
        jnp.asarray(np.array(indptr, dtype=np.int32)),
        rows,
    )


def test_csr_member(csr):
    indices, indptr, rows = csr
    users, items, expected = [], [], []
    for u in range(4):
        for i in range(10):
            users.append(u)
            items.append(i)
            expected.append(i in rows[u])
    got = S.csr_member(
        indices, indptr, jnp.asarray(users, dtype=jnp.int32), jnp.asarray(items, dtype=jnp.int32)
    )
    assert list(np.asarray(got)) == expected


def test_sample_negatives_never_positive(csr):
    indices, indptr, rows = csr
    users = jnp.asarray(np.random.RandomState(0).randint(0, 4, size=512), dtype=jnp.int32)
    negs = S.sample_negatives(
        jax.random.PRNGKey(1), users, 10, indices, indptr, num_tries=4
    )
    negs = np.asarray(negs)
    for u, j in zip(np.asarray(users), negs):
        assert j not in rows[int(u)], (u, j)
        assert 0 <= j < 10


def test_sample_negatives_exact_uniform(csr):
    indices, indptr, rows = csr
    # user 1 rated {0,2,4,6,8}; negatives must be the odd items
    users = jnp.ones(4000, dtype=jnp.int32)
    negs = np.asarray(
        S.sample_negatives_exact(jax.random.PRNGKey(0), users, 10, indices, indptr)
    )
    assert set(negs.tolist()) == {1, 3, 5, 7, 9}
    # roughly uniform across the 5 valid negatives
    counts = np.bincount(negs, minlength=10)[[1, 3, 5, 7, 9]]
    assert counts.min() > 4000 / 5 * 0.7


def test_sample_negatives_dense_user_fallback(csr):
    indices, indptr, rows = csr
    # user 1 has density 0.5 → with 2 tries the exact fallback fires often;
    # results must still never be positives
    users = jnp.ones(2048, dtype=jnp.int32)
    negs = np.asarray(
        S.sample_negatives(
            jax.random.PRNGKey(3), users, 10, indices, indptr, num_tries=1
        )
    )
    assert all(j not in rows[1] for j in negs)


def test_pairwise_epoch_shapes_and_coverage(csr):
    indices, indptr, rows = csr
    train_u = jnp.asarray([0, 0, 0, 1, 1, 1, 1, 1, 2], dtype=jnp.int32)
    train_i = jnp.asarray([1, 3, 5, 0, 2, 4, 6, 8, 9], dtype=jnp.int32)
    users, pos, neg, w = S.pairwise_epoch(
        jax.random.PRNGKey(0), train_u, train_i, indices, indptr,
        num_items=10, batch_size=4,
    )
    assert users.shape == (3, 4)
    assert float(jnp.sum(w)) == 9  # 9 real examples, 3 padded
    # every (user, pos) pair appears exactly once among weighted entries
    mask = np.asarray(w).reshape(-1) > 0
    pairs = sorted(
        zip(np.asarray(users).reshape(-1)[mask], np.asarray(pos).reshape(-1)[mask])
    )
    assert pairs == sorted(zip(np.asarray(train_u), np.asarray(train_i)))
    # negatives are never positives
    for u, j, m in zip(
        np.asarray(users).reshape(-1), np.asarray(neg).reshape(-1), np.asarray(w).reshape(-1)
    ):
        if m > 0:
            assert int(j) not in rows[int(u)]


def test_pointwise_epoch_labels(csr):
    indices, indptr, rows = csr
    train_u = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    train_i = jnp.asarray([1, 0, 9], dtype=jnp.int32)
    users, items, labels, w = S.pointwise_epoch(
        jax.random.PRNGKey(0), train_u, train_i, indices, indptr,
        num_items=10, batch_size=3, num_negatives=4,
    )
    assert users.shape == (1, 15)
    lab = np.asarray(labels).reshape(-1)
    assert lab[0] == 1 and all(lab[1:5] == 0)
    # positives carry the training item, negatives avoid positives
    u0 = int(np.asarray(users)[0, 0])
    assert int(np.asarray(items)[0, 0]) in rows[u0]


def test_bitmask_member_matches_csr(csr):
    import jax.numpy as jnp
    from qrec_tpu.ops.sampling import bitmask_member, pack_bitmask

    indices, indptr, rows = csr
    mask = jnp.asarray(
        pack_bitmask(np.asarray(indptr), np.asarray(indices), 4, 10)
    )
    users, items, expected = [], [], []
    for u in range(4):
        for i in range(10):
            users.append(u)
            items.append(i)
            expected.append(i in rows[u])
    got = bitmask_member(
        mask, jnp.asarray(users, dtype=jnp.int32), jnp.asarray(items, dtype=jnp.int32)
    )
    assert list(np.asarray(got)) == expected


def test_sample_negatives_with_bitmask(csr):
    import jax.numpy as jnp
    from qrec_tpu.ops.sampling import pack_bitmask

    indices, indptr, rows = csr
    mask = jnp.asarray(
        pack_bitmask(np.asarray(indptr), np.asarray(indices), 4, 10)
    )
    users = jnp.asarray(np.random.RandomState(5).randint(0, 4, size=512), dtype=jnp.int32)
    negs = np.asarray(
        S.sample_negatives(
            jax.random.PRNGKey(2), users, 10, indices, indptr,
            num_tries=4, bitmask=mask,
        )
    )
    for u, j in zip(np.asarray(users), negs):
        assert j not in rows[int(u)], (u, j)
