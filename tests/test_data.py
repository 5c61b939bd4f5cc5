"""Dataset / split / IO tests (reference: data/rating.py, util/dataSplit.py,
util/io.py)."""

import numpy as np
import pytest

from qrec_tpu.config import ModelConf
from qrec_tpu.data.dataset import Interactions
from qrec_tpu.data.social import SocialGraph
from qrec_tpu.data.split import cross_validation, data_split
from qrec_tpu.io import load_ratings, load_relations


def _conf(eval_setup="-ap 0.2"):
    return ModelConf(
        {
            "ratings.setup": "-columns 0 1 2",
            "evaluation.setup": eval_setup,
            "social.setup": "-columns 0 1",
        }
    )


def test_id_maps_first_appearance_order():
    conf = _conf()
    train = [["b", "y", 3.0], ["a", "x", 4.0], ["b", "x", 5.0]]
    data = Interactions(conf, train, [["a", "y", 2.0]])
    assert data.user == {"b": 0, "a": 1}
    assert data.item == {"y": 0, "x": 1}
    assert data.id2item[0] == "y"
    assert data.trainingSize() == (2, 2, 3)
    assert data.testSize() == (1, 1, 1)


def test_means_match_reference_formulas():
    conf = _conf()
    train = [["u1", "i1", 4.0], ["u1", "i2", 2.0], ["u2", "i1", 5.0]]
    data = Interactions(conf, train, [])
    assert data.user_means[data.user["u1"]] == pytest.approx(3.0)
    assert data.user_means[data.user["u2"]] == pytest.approx(5.0)
    assert data.item_means[data.item["i1"]] == pytest.approx(4.5)
    # globalMean = mean of user means (data/rating.py:84-89)
    assert data.global_mean == pytest.approx((3.0 + 5.0) / 2)
    assert data.r_scale == [2.0, 4.0, 5.0]


def test_csr_rows_sorted_and_deduped():
    conf = _conf()
    # duplicate (u1, i1): the dict semantics keep the LAST rating
    train = [["u1", "i1", 4.0], ["u1", "i2", 2.0], ["u1", "i1", 1.0]]
    data = Interactions(conf, train, [])
    row = data.user_row_ids(0)
    assert list(row) == sorted(row)
    ptr = data.u_indptr
    assert ptr[1] - ptr[0] == 2  # deduped
    i1 = data.item["i1"]
    pos = list(row).index(i1)
    assert data.u_values[ptr[0] + pos] == pytest.approx(1.0)
    assert data.rating("u1", "i1") == pytest.approx(1.0)


def test_cold_start_filter():
    conf = _conf("-ap 0.2 -cold 2")
    train = [["u1", f"i{k}", 3.0] for k in range(5)] + [["u2", "i0", 3.0]]
    test = [["u1", "i9", 4.0], ["u2", "i1", 4.0], ["u3", "i0", 2.0]]
    data = Interactions(conf, train, test)
    # u1 has 5 > 2 train ratings → removed; u2 (1 rating) and unseen u3 stay
    assert "u1" not in data.test_set_u
    assert "u2" in data.test_set_u and "u3" in data.test_set_u
    assert len(data.test_data) == 2


def test_val_carveout():
    conf = _conf("-ap 0.2 -val 0.25")
    train = [[f"u{k}", f"i{k}", 3.0] for k in range(8)]
    data = Interactions(conf, train, [["zz", "zz", 1.0]], seed=3)
    assert len(data.training_data) == 6
    assert len(data.test_data) == 2
    # original test data replaced by validation carve-out
    assert "zz" not in data.test_set_u


def test_test_eval_arrays_unseen_users_items():
    conf = _conf()
    train = [["u1", "i1", 3.0], ["u2", "i2", 3.0]]
    test = [["u1", "i2", 1.0], ["u1", "iX", 1.0], ["uX", "i1", 1.0]]
    data = Interactions(conf, train, test)
    ev = data.test_eval_arrays()
    assert ev["names"] == ["u1", "uX"]
    assert ev["uids"][0] == data.user["u1"] and ev["uids"][1] == -1
    # u1 has 2 test items: i2 (known) and iX (unseen → -1)
    assert ev["test_counts"][0] == 2
    row = set(ev["test_ids"][0].tolist())
    assert data.item["i2"] in row and -1 in row


def test_data_split_reproducible_and_ratio():
    import random

    entries = [[f"u{k}", f"i{k}", 1.0] for k in range(1000)]
    tr1, te1 = data_split(entries, 0.2, rng=random.Random(0))
    tr2, te2 = data_split(entries, 0.2, rng=random.Random(0))
    assert te1 == te2 and len(tr1) + len(te1) == 1000
    assert 130 < len(te1) < 270
    # out-of-range ratio falls back to 0.3 (util/dataSplit.py:10-11)
    _, te3 = data_split(entries, 1.5, rng=random.Random(0))
    assert 200 < len(te3) < 400


def test_cross_validation_folds():
    entries = [[f"u{k}", f"i{k}", 1.0] for k in range(10)]
    folds = list(cross_validation(entries, 5))
    assert len(folds) == 5
    all_test = [tuple(e) for _, test in folds for e in test]
    assert sorted(all_test) == sorted(tuple(e) for e in entries)
    for train, test in folds:
        assert len(train) == 8 and len(test) == 2


def test_load_ratings_binarized(tmp_path):
    p = tmp_path / "r.txt"
    p.write_text("u1 i1 5\nu1 i2 1\nu2 i1 3\n")
    conf = _conf()
    conf.config["ratings"] = str(p)
    data = load_ratings(conf, str(p))
    assert len(data) == 3 and data[0] == ["u1", "i1", 5.0]
    binar = load_ratings(conf, str(p), binarized=True, threshold=3.0)
    assert binar == [["u1", "i1", 1.0], ["u2", "i1", 1.0]]


def test_load_ratings_tab_and_comma(tmp_path):
    p = tmp_path / "r.txt"
    p.write_text("u1\ti1\t5\nu2,i2,3\n")
    conf = _conf()
    data = load_ratings(conf, str(p))
    assert data == [["u1", "i1", 5.0], ["u2", "i2", 3.0]]


def test_social_graph_cleaning():
    conf = _conf()
    train = [["u1", "i1", 3.0], ["u2", "i1", 3.0]]
    data = Interactions(conf, train, [])
    relation = [["u1", "u2", 1.0], ["u1", "uX", 1.0], ["uY", "u2", 1.0]]
    social = SocialGraph(relation, data)
    # edges touching non-rating users dropped (socialRecommender.py:9-41)
    assert len(social.relation) == 1
    assert social.hasFollowee("u1", "u2")
    assert not social.hasFollowee("u1", "uX")
    src, dst, w = social.coo()
    assert list(src) == [data.user["u1"]] and list(dst) == [data.user["u2"]]
    adj = social.scipy_adjacency()
    assert adj.shape == (2, 2) and adj.nnz == 1


def test_load_relations_two_column_tab_file(tmp_path):
    """lastfm trusts.txt shape: 2 tab-separated columns, implicit weight 1
    (util/io.py:88-111; reference confs use `-columns 0 1` for it)."""
    p = tmp_path / "trusts.txt"
    p.write_text("2\t275\n2\t428\n")
    conf = _conf()
    rel = load_relations(conf, str(p))
    assert rel == [["2", "275", 1.0], ["2", "428", 1.0]]


def test_load_relations_three_column_weighted(tmp_path):
    p = tmp_path / "trust.txt"
    p.write_text("2 966 1\n2 104 1\n")
    conf = ModelConf(
        {
            "ratings.setup": "-columns 0 1 2",
            "evaluation.setup": "-ap 0.2",
            "social.setup": "-columns 0 1 2",
        }
    )
    rel = load_relations(conf, str(p))
    assert rel == [["2", "966", 1.0], ["2", "104", 1.0]]


def test_load_relations_missing_weight_column_errors(tmp_path):
    """-columns 0 1 2 against a 2-column file must raise a clear
    DataFormatError (the bug class behind the lastfm social confs)."""
    from qrec_tpu.errors import DataFormatError

    p = tmp_path / "trusts.txt"
    p.write_text("2\t275\n")
    conf = ModelConf(
        {
            "ratings.setup": "-columns 0 1 2",
            "evaluation.setup": "-ap 0.2",
            "social.setup": "-columns 0 1 2",
        }
    )
    with pytest.raises(DataFormatError):
        load_relations(conf, str(p))
