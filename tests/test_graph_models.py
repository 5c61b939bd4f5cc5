"""Graph model family end-to-end on planted block data."""

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def _write_block_dataset(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            lines.append(f"u{u} i{i} 1\n")
    p = tmp_path / "ratings.txt"
    p.write_text("".join(lines))
    return str(p)


def _conf(tmp_path, ratings, name, extra=None):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
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
    "name,extra",
    [
        ("LightGCN", {"LightGCN": "-n_layer 2"}),
        ("NGCF", {}),
        (
            "SGL",
            {"SGL": "-n_layer 2 -lambda 0.05 -droprate 0.2 -augtype 1 -temp 0.2"},
        ),
        ("SimGCL", {"SimGCL": "-n_layer 2 -lambda 0.05 -eps 0.1"}),
    ],
)
def test_graph_model_learns_blocks(tmp_path, name, extra):
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(tmp_path, ratings, name, extra)
    rec = QRec(conf, seed=3)
    measure = rec.execute()
    parsed = parse_measure(measure)
    # random recall@10 over 30 items ≈ 0.33; block structure → well above
    assert parsed["Top 10"]["Recall"] > 0.5, (name, parsed)


def test_ssl_pallas_backend_trains(tmp_path):
    """SGL trains end-to-end through the fused Pallas InfoNCE (custom-VJP
    forward + recompute backward; interpret mode on CPU) and lands within
    noise of the XLA-loss run."""
    ratings = _write_block_dataset(tmp_path)
    extra = {
        "SGL": "-n_layer 2 -lambda 0.05 -droprate 0.2 -augtype 1 -temp 0.2",
        "num.max.epoch": "15",
    }
    m_pallas = QRec(
        _conf(tmp_path, ratings, "SGL", {**extra, "ssl.backend": "pallas"}),
        seed=3,
    ).execute()
    m_xla = QRec(
        _conf(tmp_path, ratings, "SGL", {**extra, "ssl.backend": "xla"}),
        seed=3,
    ).execute()
    rp = parse_measure(m_pallas)["Top 10"]
    rx = parse_measure(m_xla)["Top 10"]
    assert rp["Recall"] > 0.5, rp
    assert abs(rp["Recall"] - rx["Recall"]) < 0.05, (rp, rx)


def test_sgl_augmentation_types(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    for aug in (0, 2):
        conf = _conf(
            tmp_path,
            ratings,
            "SGL",
            {
                "SGL": f"-n_layer 2 -lambda 0.02 -droprate 0.2 -augtype {aug} -temp 0.2",
                "num.max.epoch": "10",
            },
        )
        measure = QRec(conf, seed=1).execute()
        assert parse_measure(measure)["Top 10"]["Recall"] > 0.3


def test_dense_dual_backend_matches_xla(tmp_path):
    """LightGCN trained through the single-pass dual-product Pallas kernel
    (graph.dense.dual=on, interpret mode on CPU) matches the two-matmul XLA
    dense path within bf16 accumulation-order noise."""
    ratings = _write_block_dataset(tmp_path)
    extra = {"LightGCN": "-n_layer 2", "num.max.epoch": "15"}
    m_dual = QRec(
        _conf(tmp_path, ratings, "LightGCN", {**extra, "graph.dense.dual": "on"}),
        seed=3,
    ).execute()
    m_xla = QRec(
        _conf(tmp_path, ratings, "LightGCN", {**extra, "graph.dense.dual": "off"}),
        seed=3,
    ).execute()
    rd = parse_measure(m_dual)["Top 10"]
    rx = parse_measure(m_xla)["Top 10"]
    assert rd["Recall"] > 0.5, rd
    assert abs(rd["Recall"] - rx["Recall"]) < 0.05, (rd, rx)


def test_simgcl_fused_views_match_unfused(tmp_path):
    """SimGCL's batched 3-view propagation (one (N, 3d) spmm per layer +
    shared first layer) must reproduce the naive three-encoder computation
    exactly — the per-view noise keys are constructed identically."""
    import jax
    import jax.numpy as jnp

    from qrec_tpu.data.dataset import Interactions
    from qrec_tpu.io import load_ratings
    from qrec_tpu.models import get_model
    from qrec_tpu.ops.spmm import spmm

    ratings = _write_block_dataset(tmp_path)
    conf = _conf(
        tmp_path, ratings, "SimGCL", {"SimGCL": "-n_layer 3 -lambda 0.05 -eps 0.1"}
    )
    from qrec_tpu.data.split import data_split
    import random as _random

    all_data = load_ratings(conf, conf["ratings"], binarized=False, threshold=0.0)
    train, test = data_split(all_data, 0.2, binarized=False, rng=_random.Random(0))
    data = Interactions(conf, train, test)
    model = get_model("SimGCL")(conf, data)
    spec = model.build()

    adj, nu, nl, eps = model.joint_adj, model.num_users, model.n_layers, model.eps
    params = spec.params
    rng = jax.random.PRNGKey(42)
    batches = spec.sampler(rng)
    batch = jax.tree_util.tree_map(lambda x: x[0], batches)
    fused_loss = float(spec.loss_fn(params, batch, rng, spec.consts))

    # naive unfused reference computation (pre-fusion code path)
    def encode_main(params):
        e = jnp.concatenate([params["user_emb"], params["item_emb"]])
        acc = 0
        for _ in range(nl):
            e = spmm(adj, e)
            acc = acc + e
        out = acc / nl
        return out[:nu], out[nu:]

    def encode_perturbed(params, key):
        e = jnp.concatenate([params["user_emb"], params["item_emb"]])
        acc = 0
        for k in range(nl):
            e = spmm(adj, e)
            noise = jax.random.uniform(jax.random.fold_in(key, k), e.shape)
            noise = noise / (jnp.linalg.norm(noise, axis=1, keepdims=True) + 1e-12)
            e = e + jnp.sign(e) * noise * eps
            acc = acc + e
        out = acc / nl
        return out[:nu], out[nu:]

    from qrec_tpu.ops import losses as L

    u, i, j, w = batch
    users, items = encode_main(params)
    pu, qi, qj = users[u], items[i], items[j]
    pos = jnp.sum(pu * qi, axis=1)
    neg = jnp.sum(pu * qj, axis=1)
    rec = L.bpr_loss(pos, neg, w) + model.reg_u * (
        0.5 * jnp.sum(w[:, None] * pu**2)
        + 0.5 * jnp.sum(w[:, None] * qi**2)
        + 0.5 * jnp.sum(w[:, None] * qj**2)
    )
    ra, rb = jax.random.split(rng)
    p1u, p1i = encode_perturbed(params, ra)
    p2u, p2i = encode_perturbed(params, rb)
    uu, um = L.unique_padded(u)
    iu, im = L.unique_padded(i)
    cl = L.infonce_dispatch(p1u[uu], p2u[uu], um, model.cl_temp, "xla", False)
    cl = cl + L.infonce_dispatch(p1i[iu], p2i[iu], im, model.cl_temp, "xla", False)
    naive_loss = float(rec + model.cl_rate * cl)

    assert abs(fused_loss - naive_loss) < 1e-3 * max(1.0, abs(naive_loss)), (
        fused_loss,
        naive_loss,
    )
