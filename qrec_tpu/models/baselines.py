"""Non-learned baselines: UserMean, ItemMean, MostPopular, Rand
(reference: model/rating/UserMean.py, model/rating/ItemMean.py,
model/ranking/MostPopular.py, model/ranking/Rand.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import Recommender


def _broadcast_score_fn(params, uids):
    """Every user gets the same catalog score vector."""
    return jnp.broadcast_to(
        params["scores"][None, :], (uids.shape[0], params["scores"].shape[0])
    )


class UserMean(Recommender):
    """Predict each user's training mean (UserMean.py:7-11). Rating only."""

    def fit(self):
        pass

    def predict_ratings(self, users, items):
        uids, _ = self._ids(users, items)
        return np.where(
            uids >= 0,
            self.data.user_means[np.maximum(uids, 0)],
            self.data.global_mean,
        ).astype(np.float64)


class ItemMean(Recommender):
    """Predict each item's training mean (ItemMean.py:6-10). Rating only."""

    def fit(self):
        pass

    def predict_ratings(self, users, items):
        _, iids = self._ids(users, items)
        return np.where(
            iids >= 0,
            self.data.item_means[np.maximum(iids, 0)],
            self.data.global_mean,
        ).astype(np.float64)


class MostPopular(Recommender):
    """Rank by training popularity counts (MostPopular.py:9-20)."""

    def fit(self):
        counts = (
            self.data.u_indptr  # noqa: F841 - ensure CSR built
        )
        pop = np.diff(self.data.i_indptr).astype(np.float32)
        # reference seeds unrated items with U(0,1) noise (MostPopular.py:10)
        rng = np.random.RandomState(self.seed)
        noise = rng.random_sample(self.num_items).astype(np.float32)
        self.scores = np.where(pop > 0, pop, noise)

    def score_fn_params(self):
        return _broadcast_score_fn, {"scores": jnp.asarray(self.scores)}


class Rand(Recommender):
    """Random scores (Rand.py:10-15)."""

    def fit(self):
        pass

    def score_fn_params(self):
        def score_fn(params, uids):
            # fold uids into the key so each eval batch differs, like the
            # reference's fresh np.random per user
            key = jax.random.fold_in(params["key"], 0)
            return jax.random.uniform(
                key, (uids.shape[0], self.num_items)
            )

        return score_fn, {"key": jax.random.PRNGKey(self.seed)}
