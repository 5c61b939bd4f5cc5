"""Collective-communication budget of the sharded paths (VERDICT r3 task 6).

For virtual meshes of 2/4/8 devices, compiles (CPU, GSPMD-partitioned) at
real lastfm scale:
  - one LightGCN training step on the COO backend,
  - one LightGCN training step on the mesh-partitioned Pallas backend
    (ShardedPaddedCOO),
  - one SimGCL training step (sharded fused InfoNCE),
  - the sharded full-catalog top-k eval,
then greps the post-SPMD HLO for collectives, sums the payload bytes per
step, and converts them to ICI/DCN time at v5e-class bandwidths.

Per-process because the device count is fixed at jax import; the parent
fans out over mesh sizes.

Usage: python scripts/comm_budget.py            # parent: table over 2/4/8
       python scripts/comm_budget.py --child N  # one mesh size (internal)
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# conservative per-chip bandwidths (bytes/s)
ICI_BPS = 180e9   # v5e ICI ~4x 400Gbps links per chip, ~80% achievable
DCN_BPS = 25e9    # ~200 Gbps/host DCN class

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

COLLECTIVE_RE = re.compile(
    r"(\w+)\[([\d,]*)\][^=]*\b"
    r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)"
)


def hlo_collective_bytes(hlo_text):
    """Sum output-payload bytes of every collective op in the HLO."""
    total = 0
    per_kind = {}
    for m in COLLECTIVE_RE.finditer(hlo_text):
        dtype, dims, kind = m.groups()
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * DTYPE_BYTES[dtype]
        total += b
        per_kind[kind] = per_kind.get(kind, 0) + b
    return total, per_kind


def child(n_dev, yelp=False):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_dev} "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, REPO)
    from bench import build_problem, build_yelp_scale
    from qrec_tpu.models import get_model

    if yelp:
        def build_problem(overrides):  # noqa: F811 — yelp-scale shapes
            return build_yelp_scale(overrides)

    results = {}

    def step_hlo(model, spec):
        optimizer = optax.adam(model.lrate)
        params, _ = model._place(spec.params)
        opt_state = optimizer.init(params)
        batches = spec.sampler(jax.random.PRNGKey(0))
        _, batches = model._place(None, batches)
        one = jax.tree_util.tree_map(lambda x: x[0], batches)
        cargs = () if spec.consts is None else (spec.consts,)

        def step(params, opt_state, batch, rng, *c):
            loss, grads = jax.value_and_grad(spec.loss_fn)(
                params, batch, rng, *c
            )
            upd, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        lowered = jax.jit(step).lower(
            params, opt_state, one, jax.random.PRNGKey(1), *cargs
        )
        return lowered.compile().as_text()

    cases = (
        ("LightGCN", "coo", "lightgcn_coo"),
        ("LightGCN", "pallas", "lightgcn_sharded_pallas"),
        ("SimGCL", "coo", "simgcl_infonce"),
    )
    if yelp:
        # pallas = the 2-D ShardedPaddedCOO kernel; auto now resolves to the
        # dense factored path at this scale (consts-threaded, r5)
        cases = (
            ("LightGCN", "pallas", "lightgcn_sharded_pallas"),
            ("LightGCN", "auto", "lightgcn_dense_auto"),
        )
    for name, backend, key in cases:
        conf, data = build_problem({
            "model.name": name,
            "parallel.setup": "on -model 2" if n_dev > 1 else "off",
            "graph.backend": backend,
            **({"SimGCL": "-n_layer 2 -lambda 0.1 -eps 0.1"} if name == "SimGCL" else {}),
        })
        model = get_model(name)(conf, data)
        spec = model.build()
        total, per_kind = hlo_collective_bytes(step_hlo(model, spec))
        results[key] = {"bytes_per_step": total, "per_kind": per_kind}

    if yelp:
        print(json.dumps({"n_dev": n_dev, "results": results}))
        return

    # sharded full-catalog eval at lastfm scale
    from qrec_tpu.parallel.mesh import make_mesh, shardings
    from qrec_tpu.parallel.topk import sharded_full_topk

    mesh = make_mesh(n_dev)
    sh = shardings(mesh)
    nu_eval, ni, d = 1024, data.num_items - (data.num_items % (2 * n_dev)), 50
    u = jax.device_put(jnp.zeros((nu_eval, d)), sh.replicated)
    v = jax.device_put(jnp.zeros((ni, d)), sh.embedding)
    lowered = jax.jit(
        lambda u, v: sharded_full_topk(mesh, u, v, 10)
    ).lower(u, v)
    total, per_kind = hlo_collective_bytes(lowered.compile().as_text())
    results["sharded_eval_topk"] = {"bytes_per_step": total, "per_kind": per_kind}

    print(json.dumps({"n_dev": n_dev, "results": results}))


def main():
    yelp = "--yelp" in sys.argv
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), yelp=yelp)
        return
    rows = []
    for n in ((4,) if yelp else (2, 4, 8)):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)]
            + (["--yelp"] if yelp else []),
            capture_output=True, text=True, cwd=REPO,
        )
        line = out.stdout.strip().split("\n")[-1] if out.stdout.strip() else ""
        if not line.startswith("{"):
            print(f"mesh {n}: FAILED\n{out.stderr[-2000:]}")
            continue
        rows.append(json.loads(line))
    print("\n| path | mesh | coll. bytes/step | ICI time | DCN time | breakdown |")
    print("|---|---|---|---|---|---|")
    for row in rows:
        for key, r in row["results"].items():
            b = r["bytes_per_step"]
            kinds = ", ".join(
                f"{k}:{v/1e6:.2f}MB" for k, v in sorted(r["per_kind"].items())
            )
            print(
                f"| {key} | {row['n_dev']} | {b/1e6:.2f} MB "
                f"| {b/ICI_BPS*1e6:.0f} us | {b/DCN_BPS*1e6:.0f} us | {kinds} |"
            )


if __name__ == "__main__":
    main()
