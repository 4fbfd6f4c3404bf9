"""BoW inverted-file keyframe database.

Rebuild of KeyFrameDatabase (reference: src/KeyFrameDatabase.cc):
word -> list of keyframes; loop-candidate detection with shared-word
counting excluding covisible KFs, the 0.8*maxCommonWords cut, covisibility-
group score accumulation and the 0.75*bestAccScore cut (76-197);
relocalization candidates without the covisibility exclusion (199-310).
Host-side (tiny sparse integer work).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Set

import numpy as np

from airdos_tpu.bow.vocabulary import Vocabulary
from airdos_tpu.slam.map import KeyFrame, SlamMap


class KeyFrameDatabase:
    def __init__(self, vocabulary: Vocabulary, slam_map: SlamMap):
        self.voc = vocabulary
        self.map = slam_map
        # word -> set of KF ids: O(1) erase (the reference's std::list
        # remove is O(n) per word — wrong shape at 1000-KF maps)
        self.inverted: Dict[int, Set[int]] = defaultdict(set)

    def ensure_bow(self, kf: KeyFrame):
        if kf.bow is None:
            bow, wids, fnodes = self.voc.transform(kf.desc32, kf.valid)
            kf.bow = bow
            kf.word_ids = wids
            kf.feat_nodes = fnodes

    def add(self, kf: KeyFrame):
        if getattr(kf, "_in_db", False):
            return
        kf._in_db = True
        self.ensure_bow(kf)
        for w in kf.bow:
            self.inverted[w].add(kf.id)

    def erase(self, kf: KeyFrame):
        if kf.bow is None:
            return
        for w in kf.bow:
            s = self.inverted.get(w)
            if s is not None:
                s.discard(kf.id)
        kf._in_db = False

    def clear(self):
        self.inverted = defaultdict(set)
        for kf in self.map.kfs.values():
            kf._in_db = False

    # ------------------------------------------------------------------
    def _shared_word_counts(self, bow: Dict[int, float],
                            exclude: Set[int]) -> Dict[int, int]:
        counts: Dict[int, int] = defaultdict(int)
        for w in bow:
            for kid in self.inverted.get(w, ()):
                if kid not in exclude:
                    kf = self.map.kfs.get(kid)
                    if kf is not None and not kf.bad:
                        counts[kid] += 1
        return counts

    def detect_loop_candidates(self, kf: KeyFrame, min_score: float) -> List[int]:
        self.ensure_bow(kf)
        exclude = set(kf.covis) | {kf.id}
        counts = self._shared_word_counts(kf.bow, exclude)
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = []
        for kid, c in counts.items():
            if c <= min_common:
                continue
            other = self.map.kfs[kid]
            self.ensure_bow(other)
            s = Vocabulary.score(kf.bow, other.bow)
            if s >= min_score:
                scored.append((kid, s))
        if not scored:
            return []
        # accumulate score over covisibility groups (top-10 covisibles)
        acc = []
        for kid, s in scored:
            group = [kid] + self.map.kfs[kid].best_covisible(10)
            best_in_group, acc_score = kid, 0.0
            best_s = s
            sdict = dict(scored)
            for gid in group:
                gs = sdict.get(gid)
                if gs is not None:
                    acc_score += gs
                    if gs > best_s:
                        best_s = gs
                        best_in_group = gid
            acc.append((best_in_group, acc_score))
        best_acc = max(a for _, a in acc)
        th = 0.75 * best_acc
        out, seen = [], set()
        for kid, a in acc:
            if a > th and kid not in seen:
                seen.add(kid)
                out.append(kid)
        return out

    def detect_reloc_candidates(self, bow: Dict[int, float]) -> List[int]:
        counts = self._shared_word_counts(bow, set())
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = 0.8 * max_common
        scored = {}
        for kid, c in counts.items():
            if c <= min_common:
                continue
            other = self.map.kfs[kid]
            self.ensure_bow(other)
            scored[kid] = Vocabulary.score(bow, other.bow)
        if not scored:
            return []
        acc = []
        for kid, s in scored.items():
            group = [kid] + self.map.kfs[kid].best_covisible(10)
            acc_score, best_in_group, best_s = 0.0, kid, s
            for gid in group:
                gs = scored.get(gid)
                if gs is not None:
                    acc_score += gs
                    if gs > best_s:
                        best_s, best_in_group = gs, gid
            acc.append((best_in_group, acc_score))
        best_acc = max(a for _, a in acc)
        th = 0.75 * best_acc
        out, seen = [], set()
        for kid, a in acc:
            if a >= th and kid not in seen:
                seen.add(kid)
                out.append(kid)
        return out
