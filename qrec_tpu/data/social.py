"""Array-native trust/social graph replacing the reference's ``data/social.py``.

The reference keeps followee/follower dict-of-dicts plus its own user ordering
(data/social.py:13-26) and cleans relations against the rating users inside
``SocialRecommender`` (base/socialRecommender.py:9-41). Here the cleaned,
rating-id-aligned edge arrays are the primary representation: social models
consume COO edges in *rating-user id space* directly, which is what the device
SpMM/regularizer paths need.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from .dataset import Interactions


class SocialGraph:
    """Trust-relation store.

    When constructed with ``data`` (an :class:`Interactions`), relations whose
    endpoints lack ratings are dropped — the exact cleaning the reference does
    in base/socialRecommender.py:9-41 — and id-space arrays are built against
    ``data.user``. Without ``data`` it behaves like the raw reference store
    with its own first-appearance user ordering (data/social.py:21-24).
    """

    def __init__(self, relation: List[list], data: Optional[Interactions] = None):
        self.followees: Dict[str, Dict[str, float]] = defaultdict(dict)
        self.followers: Dict[str, Dict[str, float]] = defaultdict(dict)

        if data is not None:
            self.relation = [
                r for r in relation if r[0] in data.user and r[1] in data.user
            ]
            user_map = data.user
        else:
            self.relation = list(relation)
            user_map = {}
            for u1, u2, _ in self.relation:
                if u1 not in user_map:
                    user_map[u1] = len(user_map)
                if u2 not in user_map:
                    user_map[u2] = len(user_map)
        self.user = user_map
        num_users = (
            data.num_users if data is not None else len(user_map)
        )
        self.num_users = num_users

        n = len(self.relation)
        self.src = np.empty(n, dtype=np.int32)
        self.dst = np.empty(n, dtype=np.int32)
        self.weight_arr = np.empty(n, dtype=np.float32)
        for k, (u1, u2, w) in enumerate(self.relation):
            self.followees[u1][u2] = w
            self.followers[u2][u1] = w
            self.src[k] = user_map[u1]
            self.dst[k] = user_map[u2]
            self.weight_arr[k] = float(w)

        # in/out degrees in id space (used by SoRec's sqrt(d-/(d+ + d-))
        # trust weighting and normalized social adjacencies)
        self.out_degree = np.bincount(self.src, minlength=num_users).astype(np.float32)
        self.in_degree = np.bincount(self.dst, minlength=num_users).astype(np.float32)

    # ---- reference-compatible surface ----------------------------------
    def getFollowees(self, u: str) -> Dict[str, float]:  # noqa: N802
        return self.followees.get(u, {})

    def getFollowers(self, u: str) -> Dict[str, float]:  # noqa: N802
        return self.followers.get(u, {})

    def hasFollowee(self, u1: str, u2: str) -> bool:  # noqa: N802
        return u2 in self.followees.get(u1, {})

    def hasFollower(self, u1: str, u2: str) -> bool:  # noqa: N802
        return u2 in self.followers.get(u1, {})

    def weight(self, u1: str, u2: str) -> float:
        return self.followees.get(u1, {}).get(u2, 0)

    def trustSize(self):  # noqa: N802
        return (len(self.user), len(self.relation))

    # ---- array-native accessors -----------------------------------------
    def coo(self):
        """(src, dst, weight) int32/float32 arrays in rating-user id space."""
        return self.src, self.dst, self.weight_arr

    def scipy_adjacency(self):
        """U×U sparse trust matrix (rows follow, cols followed)."""
        import scipy.sparse as sp

        return sp.csr_matrix(
            (self.weight_arr, (self.src, self.dst)),
            shape=(self.num_users, self.num_users),
        )
