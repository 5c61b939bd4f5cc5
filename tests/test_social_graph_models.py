"""Social/hypergraph SSL family end-to-end on planted block data + social
blocks."""

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def _write_dataset(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            lines.append(f"u{u} i{i} 1\n")
    rp = tmp_path / "ratings.txt"
    rp.write_text("".join(lines))
    trust = []
    for u in range(40):
        lo = 0 if u < 20 else 20
        for f in rng.choice(20, size=4, replace=False) + lo:
            if f != u:
                trust.append(f"u{u} u{f} 1\n")
    # add some reciprocated edges so motif algebra has bidirectional pairs
    for u in range(0, 40, 2):
        v = u + 1
        trust.append(f"u{u} u{v} 1\n")
        trust.append(f"u{v} u{u} 1\n")
    tp = tmp_path / "trust.txt"
    tp.write_text("".join(trust))
    return str(rp), str(tp)


def _conf(ratings, trust, name, extra=None):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
        "social": trust,
        "social.setup": "-columns 0 1 2",
        "model.name": name,
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "on -topN 10",
        "num.factors": "16",
        "num.max.epoch": "30",
        "batch_size": "64",
        "learnRate": "-init 0.05 -max 1",
        "reg.lambda": "-u 0.001 -i 0.001 -b 0.1 -s 0.1",
        "output.setup": "off -dir ./results/",
        "seed": "7",
    }
    if extra:
        base.update(extra)
    return ModelConf(base)


@pytest.mark.parametrize(
    "name,extra,floor",
    [
        ("MHCN", {"MHCN": "-n_layer 2 -ss_rate 0.01"}, 0.5),
        (
            "SEPT",
            {"SEPT": "-n_layer 2 -ss_rate 0.005 -drop_rate 0.3 -ins_cnt 5"},
            0.5,
        ),
        (
            "BUIR",
            {
                "BUIR": "-n_layer 2 -tau 0.99 -drop_rate 0.2",
                "learnRate": "-init 0.01 -max 1",
                "num.max.epoch": "40",
            },
            0.35,  # negative-sample-free objective learns slower on tiny data
        ),
        ("DiffNet", {"DiffNet": "-n_layer 2"}, 0.5),
        ("DHCF", {}, 0.5),
    ],
)
def test_social_graph_models(tmp_path, name, extra, floor):
    ratings, trust = _write_dataset(tmp_path)
    conf = _conf(ratings, trust, name, extra)
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > floor, (name, parsed)


def test_l2n_zero_row_has_finite_gradient():
    """SEPT's augmented view isolates nodes (zero propagated rows); the
    TF-style l2_normalize must give finite (zero) gradients there — the
    norm+eps form NaN'd SEPT's whole joint phase (SEPT.py:282-310)."""
    import jax
    import jax.numpy as jnp

    from qrec_tpu.models.social_graph import _l2n

    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 2.0, 2.0]])

    def f(x):
        return jnp.sum(_l2n(x) * jnp.ones_like(x))

    g = jax.grad(f)(x)
    # finite (TF gives rsqrt(eps)*cotangent at zero rows — large but finite;
    # the old norm+eps form gave NaN). Adam absorbs the magnitude.
    assert bool(jnp.all(jnp.isfinite(g)))
    # nonzero row normalizes to unit norm
    assert float(jnp.linalg.norm(_l2n(x)[1])) == pytest.approx(1.0, abs=1e-5)


def test_masked_infonce_zero_row_grad_finite():
    import jax
    import jax.numpy as jnp

    from qrec_tpu.ops import losses as L

    v1 = jnp.array([[0.0, 0.0], [1.0, 0.5], [0.3, -0.2]])
    v2 = jnp.array([[0.1, 0.2], [0.0, 0.0], [0.5, 0.5]])
    mask = jnp.array([1.0, 1.0, 1.0])
    g = jax.grad(lambda a: L.masked_infonce(a, v2, mask, 0.2))(v1)
    assert bool(jnp.all(jnp.isfinite(g)))
