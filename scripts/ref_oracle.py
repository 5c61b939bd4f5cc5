"""Reference-run parity oracle (VERDICT r3 task 1).

Executes the *reference* QRec (read-only at /root/reference) in a scratch
copy with three shims — numba (absent: identity @jit, util/qmath.py:3),
mkl (absent: no-op thread control, QRec.py:6), and tensorflow.compat.v1
(TF2.21 is installed; reference graphs are TF1, e.g. LightGCN.py:17-41) —
and runs qrec_tpu on byte-identical fixed splits with byte-identical
hyperparameters, so measure files can be diffed directly.

Fixed splits:
  - FilmTrust: the reference's own shipped trainset.txt/testset.txt
    (config/UserKNN.conf uses exactly this protocol).
  - lastfm: seeded 80/20 split from scripts/make_parity_split.py, loaded
    on both sides via `evaluation.setup=-testSet ... -b 1`.

Usage:
  python scripts/ref_oracle.py setup                 # build /tmp/refrun + splits + confs
  python scripts/ref_oracle.py run-ref [M ...]       # run reference side (all or named)
  python scripts/ref_oracle.py run-tpu [M ...]       # run qrec_tpu side (CPU backend)
  python scripts/ref_oracle.py table                 # markdown comparison table
"""
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
REFRUN = "/tmp/refrun"
PARITY_DATA = "/tmp/parity_data"
TPU_CONFS = "/tmp/parity_tpu/confs"
TPU_RESULTS = "/tmp/parity_tpu/results"
REF_RESULTS = os.path.join(REFRUN, "results_fixed")
LOGS = "/tmp/parity_logs"

FILMTRUST = dict(
    ratings=f"{REF}/dataset/FilmTrust/trainset.txt",
    test=f"{REF}/dataset/FilmTrust/testset.txt",
    social=f"{REF}/dataset/FilmTrust/trust.txt",
    binarize=None,
    ranking="off -topN -1",
)
LASTFM = dict(
    ratings=f"{PARITY_DATA}/lastfm_train.txt",
    test=f"{PARITY_DATA}/lastfm_test.txt",
    social=f"{REF}/dataset/lastfm/trusts.txt",
    binarize="1",
    ranking="on -topN 10",
)

# model -> (reference conf filename, dataset recipe, timeout seconds)
MODELS = {
    # FilmTrust rating family (reference's own fixed split)
    "UserMean": ("UserMean.conf", FILMTRUST, 600),
    "ItemMean": ("ItemMean.conf", FILMTRUST, 600),
    "UserKNN": ("UserKNN.conf", FILMTRUST, 1800),
    "ItemKNN": ("ItemKNN.conf", FILMTRUST, 1800),
    "SlopeOne": ("SlopeOne.conf", FILMTRUST, 1800),
    "BasicMF": ("BasicMF.conf", FILMTRUST, 3600),
    "PMF": ("PMF.conf", FILMTRUST, 3600),
    "SVD": ("SVD.conf", FILMTRUST, 3600),
    "SVDPlusPlus": ("SVD++.conf", FILMTRUST, 7200),
    "EE": ("EE.conf", FILMTRUST, 3600),
    "SoRec": ("SoRec.conf", FILMTRUST, 3600),
    "SoReg": ("SoReg.conf", FILMTRUST, 3600),
    "SocialMF": ("SocialMF.conf", FILMTRUST, 3600),
    "RSTE": ("RSTE.conf", FILMTRUST, 3600),
    "LOCABAL": ("LOCABAL.conf", FILMTRUST, 3600),
    "SREE": ("SREE.conf", FILMTRUST, 3600),
    "SocialFD": ("SocialFD.conf", FILMTRUST, 3600),
    # lastfm ranking family (shared seeded split)
    "MostPopular": ("MostPopular.conf", LASTFM, 1800),
    "Rand": ("Rand.conf", LASTFM, 1800),
    "WRMF": ("WRMF.conf", LASTFM, 3600),
    "ExpoMF": ("ExpoMF.conf", LASTFM, 7200),
    "CoFactor": ("CoFactor.conf", LASTFM, 7200),
    "SERec": ("SERec.conf", LASTFM, 7200),
    "SBPR": ("SBPR.conf", LASTFM, 10800),
    "TBPR": ("TBPR.conf", LASTFM, 10800),
    # TF-family (reference runs its TF1 graphs under the tensorflow.compat.v1
    # shim — the measured TF baseline of BASELINE.md)
    "BPR": ("BPR.conf", LASTFM, 10800),
    "LightGCN": ("LightGCN.conf", LASTFM, 14400),
    # deep TF family (VERDICT r4 #5): same tf1 graph vocabulary as
    # BPR/LightGCN (placeholder/Adam/embedding_lookup + contrib shims)
    "NeuMF": ("NeuMF.conf", LASTFM, 14400),
    "DMF": ("DMF.conf", LASTFM, 14400),
    "CDAE": ("CDAE.conf", LASTFM, 14400),
    "APR": ("APR.conf", LASTFM, 14400),
    "CFGAN": ("CFGAN.conf", LASTFM, 14400),
    "IRGAN": ("IRGAN.conf", LASTFM, 14400),
    # walk family (VERDICT r4 #9): unblocked by the GENSIM_SHIM below
    "CUNE_BPR": ("CUNE_BPR.conf", LASTFM, 14400),
    "IF_BPR": ("IF_BPR.conf", LASTFM, 21600),
}

# Per-model conf overrides applied to BOTH sides identically. The three SGD
# models below NaN on the reference's *numpy* path with their shipped
# learnRate (the shipped BasicMF/PMF/SVD confs carry -tf, i.e. the TF path;
# SoRec/SoReg as shipped diverge under the bold driver on the fixed split),
# so the oracle pins a convergent LR for the apples-to-apples numpy run.
OVERRIDES = {
    "BasicMF": {"learnRate": "-init 0.01 -max 0.02"},
    "SoRec": {"learnRate": "-init 0.005 -max 0.01"},
    "SoReg": {"learnRate": "-init 0.01 -max 0.02"},
    # one jitted batched step has a lower stable-LR ceiling than the
    # reference's per-sample Python SGD (batch-summed squared-error Hessian);
    # pin LRs below the measured divergence points (identical on both sides)
    "SVDPlusPlus": {"learnRate": "-init 0.01 -max 0.02"},
    "SocialMF": {"learnRate": "-init 0.01 -max 0.02"},
    "LOCABAL": {"learnRate": "-init 0.01 -max 0.02"},
    # the reference's numpy SBPR path crashes (SBPR.py:46 indexes FPSet[user]
    # by the *list* kItems instead of item_k); its shipped conf runs -tf, so
    # the oracle keeps -tf on both sides (TF1 shim on the reference side)
    "SBPR": {"_eval_suffix": " -tf"},
    # same batched-step stable-LR ceiling as BasicMF/SocialMF above: our
    # jitted batch update diverges at the conf's 0.05 (loss rises by epoch
    # 30) while the reference's per-sample loop tolerates it
    "IF_BPR": {"learnRate": "-init 0.01 -max 0.02"},
    # BPR's numpy path is a 74k-sample/epoch Python loop (hours at 100
    # epochs); the conf's batch protocol is the TF path on both sides
    "BPR": {"_eval_suffix": " -tf"},
}

RUN_REF_DRIVER = '''"""Headless driver for the reference QRec (generated by ref_oracle.py)."""
import sys, os, time, types
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

def install_tf1_shim():
    import tensorflow.compat.v1 as tf1
    tf1.disable_v2_behavior()
    tf1.disable_eager_execution()
    def xavier_initializer(**kw):
        init = tf1.glorot_uniform_initializer()
        # DMF.py:58 passes stddev= to the returned callable; tf.contrib's
        # variance-scaling initializers tolerated extra kwargs
        return lambda shape, dtype=None, **extra: init(shape, dtype)

    layers = types.SimpleNamespace(
        xavier_initializer=xavier_initializer,
        l2_regularizer=lambda scale: (lambda w: scale * tf1.nn.l2_loss(w)),
    )
    tf1.contrib = types.SimpleNamespace(layers=layers)
    if not hasattr(tf1, "float"):
        tf1.float = tf1.float32  # DMF.py:51 uses the ancient tf.float alias
    sys.modules["tensorflow"] = tf1
    return tf1

def patch_topk():
    # numpy replacement for util/qmath.py:134-146 (same ids/scores, desc order);
    # the pure-Python heapq fallback under the numba shim is too slow for
    # per-epoch ranking_performance.
    import numpy as np
    import util.qmath as qmath
    def find_k_largest(K, candidates):
        arr = np.asarray(candidates, dtype=np.float64)
        k = min(K, arr.size)
        idx = np.argpartition(-arr, k - 1)[:k]
        idx = idx[np.argsort(-arr[idx], kind="stable")]
        return [int(i) for i in idx], [float(arr[i]) for i in idx]
    qmath.find_k_largest = find_k_largest

def main():
    conf_path = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    import numpy as np, random
    np.random.seed(seed)
    random.seed(seed)
    install_tf1_shim()
    patch_topk()
    from util.config import ModelConf
    from QRec import QRec
    t0 = time.time()
    QRec(ModelConf(conf_path)).execute()
    print("WALL_SECONDS %.1f" % (time.time() - t0))

if __name__ == "__main__":
    main()
'''

NUMBA_SHIM = '''# numba shim: identity @jit (util/qmath.py uses @jit(nopython=True)).
def jit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]
    def deco(f):
        return f
    return deco
'''

MKL_SHIM = '''# mkl shim: QRec.py imports mkl for thread control only.
def set_num_threads(n):
    pass
def get_max_threads():
    return 8
'''

# gensim shim (VERDICT r4 #9): the reference's walk family (CUNE_BPR.py:9,
# IF_BPR.py:8, RSGAN.py:8) needs only Word2Vec(walks, size, window,
# min_count, iter) + .wv[word]. Pure-numpy vectorized SGNS — deliberately
# jax-free so the oracle's reference process can never touch the TPU tunnel.
GENSIM_SHIM = '''"""Minimal gensim.models.word2vec stand-in (generated by ref_oracle.py).

Implements skip-gram with negative sampling over the given walks: the only
surface the reference's walk family consumes (Word2Vec(...).wv[word]).
"""
import numpy as np


class _KeyedVectors:
    def __init__(self, vocab, vectors):
        self._index = vocab
        self._vectors = vectors

    def __getitem__(self, word):
        return self._vectors[self._index[word]]

    def __contains__(self, word):
        return word in self._index


class Word2Vec:
    def __init__(self, sentences, size=100, window=5, min_count=0, iter=3,
                 negative=5, alpha=0.025, seed=1, **kwargs):
        rng = np.random.RandomState(seed)
        vocab = {}
        ids = []
        for sent in sentences:
            row = []
            for w in sent:
                if w not in vocab:
                    vocab[w] = len(vocab)
                row.append(vocab[w])
            ids.append(np.asarray(row, dtype=np.int64))
        n_words = max(1, len(vocab))
        centers, contexts = [], []
        for row in ids:
            L = len(row)
            for off in range(1, window + 1):
                if L > off:
                    centers.append(row[:-off]); contexts.append(row[off:])
                    centers.append(row[off:]); contexts.append(row[:-off])
        if centers:
            centers = np.concatenate(centers)
            contexts = np.concatenate(contexts)
        else:
            centers = contexts = np.zeros(0, dtype=np.int64)
        W_in = (rng.rand(n_words, size).astype(np.float32) - 0.5) / size
        W_out = np.zeros((n_words, size), dtype=np.float32)
        n = len(centers)
        bs = 8192
        for ep in range(max(1, iter)):
            order = rng.permutation(n)
            for s in range(0, n, bs):
                idx = order[s:s + bs]
                c, o = centers[idx], contexts[idx]
                negs = rng.randint(0, n_words, size=(len(idx), negative))
                vc = W_in[c]                      # (b, d)
                vo = W_out[o]                     # (b, d)
                vn = W_out[negs]                  # (b, k, d)
                # gensim clips scores to +-MAX_EXP=6 via its sigmoid table
                pos_x = np.clip(np.sum(vc * vo, axis=1), -6.0, 6.0)
                neg_x = np.clip(np.einsum("bd,bkd->bk", vc, vn), -6.0, 6.0)
                pos_s = 1.0 / (1.0 + np.exp(-pos_x))
                neg_s = 1.0 / (1.0 + np.exp(-neg_x))
                g_pos = (1.0 - pos_s)[:, None] * alpha      # (b, 1)
                g_neg = -neg_s[:, :, None] * alpha          # (b, k, 1)
                d_in = g_pos * vo + np.sum(g_neg * vn, axis=1)
                np.add.at(W_out, o, g_pos * vc)
                np.add.at(W_out, negs.ravel(),
                          (g_neg * vc[:, None, :]).reshape(-1, W_out.shape[1]))
                np.add.at(W_in, c, d_in)
        self.wv = _KeyedVectors(vocab, W_in)
'''


def parse_conf(path):
    items = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            items.append((k.strip(), v.strip()))
    return items


def build_fixed_conf(ref_conf_path, recipe, results_dir, base_items=None, overrides=None):
    """Reference conf -> fixed-split conf. Hyperparameters come from the
    reference conf verbatim; only data paths / eval protocol / output are
    rewritten (and -tf dropped: the oracle compares the default train paths)."""
    ref_items = parse_conf(ref_conf_path)
    merged = dict(base_items or [])
    order = [k for k, _ in (base_items or [])]
    for k, v in ref_items:
        if k not in merged:
            order.append(k)
        merged[k] = v
    overrides = dict(overrides or {})
    eval_setup = f"-testSet {recipe['test']}"
    if recipe["binarize"]:
        eval_setup += f" -b {recipe['binarize']}"
    eval_setup += overrides.pop("_eval_suffix", "")
    merged["ratings"] = recipe["ratings"]
    merged["ratings.setup"] = "-columns 0 1 2"
    merged["evaluation.setup"] = eval_setup
    merged["item.ranking"] = recipe["ranking"]
    merged["output.setup"] = f"on -dir {results_dir}/"
    if "social" in merged:
        # rewrite only the path; keep the reference's own social.setup
        # (lastfm trusts.txt is 2-column: config/SBPR.conf "-columns 0 1")
        merged["social"] = recipe["social"]
    for k, v in (overrides or {}).items():
        if k not in merged:
            order.append(k)
        merged[k] = v
    return "".join(f"{k}={merged[k]}\n" for k in order)


def setup():
    if not os.path.isdir(REFRUN):
        shutil.copytree(REF, REFRUN)
    for rel in (".MISSING_LARGE_BLOBS",):
        p = os.path.join(REFRUN, rel)
        if os.path.exists(p):
            os.remove(p)
    with open(os.path.join(REFRUN, "numba.py"), "w") as f:
        f.write(NUMBA_SHIM)
    with open(os.path.join(REFRUN, "mkl.py"), "w") as f:
        f.write(MKL_SHIM)
    os.makedirs(os.path.join(REFRUN, "gensim/models"), exist_ok=True)
    with open(os.path.join(REFRUN, "gensim/__init__.py"), "w") as f:
        f.write("")
    with open(os.path.join(REFRUN, "gensim/models/__init__.py"), "w") as f:
        f.write("from . import word2vec\n")
    with open(os.path.join(REFRUN, "gensim/models/word2vec.py"), "w") as f:
        f.write(GENSIM_SHIM)
    with open(os.path.join(REFRUN, "run_ref.py"), "w") as f:
        f.write(RUN_REF_DRIVER)
    # upstream py2 leftovers: IF_BPR.py:126,177,257,261 use true division
    # where Python 3 needs integer division (range(float) / float list
    # index) — the model cannot run at all on the reference's own stated
    # Python 3.7; patch the scratch copy's operators to `//` so the oracle
    # can execute it
    ifbpr = os.path.join(REFRUN, "model/ranking/IF_BPR.py")
    if os.path.exists(ifbpr):
        with open(ifbpr) as f:
            src = f.read()
        fixed = (
            src.replace(
                "for i in range(self.walkLength / len(mp[1:])):",
                "for i in range(self.walkLength // len(mp[1:])):",
            )
            .replace(
                "fList[self.topK / 2][1]",
                "fList[self.topK // 2][1]",
            )
            .replace(
                "[:self.topK / 2]) / (self.topK / 2)",
                "[:self.topK // 2]) / (self.topK // 2)",
            )
        )
        if fixed != src:
            with open(ifbpr, "w") as f:
                f.write(fixed)
    if not os.path.exists(os.path.join(PARITY_DATA, "lastfm_train.txt")):
        subprocess.check_call([sys.executable, os.path.join(REPO, "scripts/make_parity_split.py")])
    for d in (os.path.join(REFRUN, "config/fixed"), REF_RESULTS, TPU_CONFS, TPU_RESULTS, LOGS):
        os.makedirs(d, exist_ok=True)
    # generate conf pairs
    for name, (conf_file, recipe, _t) in MODELS.items():
        ref_conf = os.path.join(REF, "config", conf_file)
        ovr = OVERRIDES.get(name)
        text = build_fixed_conf(ref_conf, recipe, REF_RESULTS, overrides=ovr)
        with open(os.path.join(REFRUN, "config/fixed", name + ".conf"), "w") as f:
            f.write(text)
        our_base = os.path.join(REPO, "config", name + ".conf")
        base_items = parse_conf(our_base) if os.path.exists(our_base) else None
        text = build_fixed_conf(ref_conf, recipe, TPU_RESULTS, base_items, overrides=ovr)
        with open(os.path.join(TPU_CONFS, name + ".conf"), "w") as f:
            f.write(text)
    print(f"setup done: {len(MODELS)} conf pairs")


def run_side(side, names):
    names = names or list(MODELS)
    for name in names:
        _conf_file, _recipe, tmo = MODELS[name]
        t0 = time.time()
        log = os.path.join(LOGS, f"{side}_{name}.log")
        if side == "ref":
            cmd = [sys.executable, "run_ref.py", f"config/fixed/{name}.conf"]
            cwd = REFRUN
        else:
            conf = os.path.join(TPU_CONFS, name + ".conf")
            platform = os.environ.get("ORACLE_PLATFORM", "cpu")  # cpu | axon
            code = (
                "import jax; jax.config.update('jax_platforms', %r);"
                "import sys; sys.path.insert(0, %r);"
                "from qrec_tpu import ModelConf, QRec; QRec(ModelConf(%r)).execute()"
            ) % (platform, REPO, conf)
            cmd = [sys.executable, "-c", code]
            cwd = REPO
        with open(log, "w") as lf:
            try:
                subprocess.run(cmd, cwd=cwd, stdout=lf, stderr=subprocess.STDOUT, timeout=tmo, check=True)
                status = "ok"
            except subprocess.TimeoutExpired:
                status = "TIMEOUT"
            except subprocess.CalledProcessError as e:
                status = f"FAIL rc={e.returncode}"
        print(f"[{side}] {name}: {status} ({time.time()-t0:.0f}s)  log={log}", flush=True)


def latest_measure(results_dir, name):
    pat = re.compile(re.escape(name) + r"@.*measure.*\.txt$")
    cands = [f for f in os.listdir(results_dir) if pat.match(f)]
    if not cands:
        return None
    cands.sort(key=lambda f: os.path.getmtime(os.path.join(results_dir, f)))
    vals = {}
    with open(os.path.join(results_dir, cands[-1])) as f:
        for line in f:
            m = re.match(r"(MAE|RMSE|Precision|Recall|F1|NDCG):([-\d.eE]+)", line.strip())
            if m:
                vals[m.group(1)] = float(m.group(2))
    return vals


def table():
    ref_map = {"SVDPlusPlus": "SVDPlusPlus"}
    print("| Model | metric | reference | qrec_tpu | delta |")
    print("|---|---|---|---|---|")
    for name, (_c, recipe, _t) in MODELS.items():
        ref_name = ref_map.get(name, name)
        rv = latest_measure(REF_RESULTS, ref_name)
        tv = latest_measure(TPU_RESULTS, name)
        metrics = ("MAE", "RMSE") if recipe is FILMTRUST else ("Precision", "Recall", "NDCG")
        for m in metrics:
            r = rv.get(m) if rv else None
            t = tv.get(m) if tv else None
            d = (t - r) if (r is not None and t is not None) else None
            fmt = lambda x: f"{x:.4f}" if x is not None else "—"
            print(f"| {name} | {m} | {fmt(r)} | {fmt(t)} | {fmt(d)} |")


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "setup"
    if cmd == "setup":
        setup()
    elif cmd == "run-ref":
        run_side("ref", sys.argv[2:])
    elif cmd == "run-tpu":
        run_side("tpu", sys.argv[2:])
    elif cmd == "table":
        table()
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
