"""Approximate-SPICE fixture: quantify parser agreement against
hand-derived jar-convention scene graphs.

The official jar cannot run here (git-lfs placeholder, no Java), so parity
cannot be asserted — instead this fixture pins DOWN the approximation:
each caption carries a scene graph hand-derived following the Stanford
scene-graph-parser conventions the jar uses (lemmatized heads, attributes
from modifiers/copulas, relations with collapsed particles), and the test
measures tuple-level F1 between `parse_scene_graph`'s output and that
target. The asserted floor documents the expected agreement level; the
per-caption scores make regressions in the chunker visible.

This is agreement with a CONVENTION-faithful manual parse, not with jar
output — approximate SPICE stays labeled approximate (PARITY.md)."""

import pytest

from recurrent_fusion_network_tpu.metrics.spice_approx import (
    _Matcher,
    parse_scene_graph,
)

pytestmark = pytest.mark.quick

# caption -> (objects, attributes, relations) per jar conventions
FIXTURE = [
    (
        "a man riding a horse on a beach",
        {("man",), ("horse",), ("beach",)},
        set(),
        {("man", "ride", "horse"), ("man", "on", "beach")},
    ),
    (
        "two dogs are running in the grass",
        {("dog",), ("grass",)},
        {("dog", "2")},
        {("dog", "run in", "grass")},
    ),
    (
        "a large red truck parked next to a small building",
        {("truck",), ("building",)},
        {("truck", "large"), ("truck", "red"), ("building", "small")},
        {("truck", "park next to", "building")},
    ),
    (
        "a man and a woman sitting on a wooden bench",
        {("man",), ("woman",), ("bench",)},
        {("bench", "wooden")},
        {("man", "sit on", "bench"), ("woman", "sit on", "bench")},
    ),
    (
        "a black and white cat sleeping on a couch",
        {("cat",), ("couch",)},
        {("cat", "black"), ("cat", "white")},
        {("cat", "sleep on", "couch")},
    ),
    (
        "the shirt is red",
        {("shirt",)},
        {("shirt", "red")},
        set(),
    ),
    (
        "a group of people standing around a table with food",
        {("group",), ("people",), ("table",), ("food",)},
        set(),
        {("group", "of", "people"), ("group", "stand around", "table"),
         ("group", "with", "food")},
    ),
    (
        "a young girl standing on top of a tennis court",
        {("girl",), ("court",)},
        {("girl", "young"), ("court", "tennis")},
        {("girl", "stand on top of", "court")},
    ),
    (
        "three children playing soccer in a park",
        {("child",), ("soccer",), ("park",)},
        {("child", "3")},
        {("child", "play", "soccer"), ("child", "in", "park")},
    ),
    (
        "a plate of food on a wooden table",
        {("plate",), ("food",), ("table",)},
        {("table", "wooden")},
        {("plate", "of", "food"), ("plate", "on", "table")},
    ),
]


def _f1(cand, ref):
    m = _Matcher(None).count_matches(cand, ref)
    if not cand or not ref:
        return 0.0 if (cand or ref) else 1.0
    p, r = m / len(cand), m / len(ref)
    return 2 * p * r / (p + r) if p + r else 0.0


class TestJarConventionAgreement:
    def test_tuple_agreement_floor(self):
        scores = []
        for caption, objs, attrs, rels in FIXTURE:
            g = parse_scene_graph(caption)
            target = objs | attrs | rels
            scores.append((caption, _f1(g.tuples(), target)))
        mean = sum(s for _, s in scores) / len(scores)
        # r3 measured mean 1.0 after the compound-preposition fold; assert
        # a regression floor well above chance but below perfection (the
        # chunker is not a parser and harder captions WILL deviate)
        assert mean >= 0.75, scores
        # no caption should collapse entirely
        for caption, s in scores:
            assert s >= 0.4, (caption, s)

    def test_objects_nearly_exact(self):
        """Head-noun extraction is the most load-bearing stage: object
        precision/recall should be near-perfect on the fixture."""
        total_m = total_c = total_r = 0
        for caption, objs, attrs, rels in FIXTURE:
            got = {t for t in parse_scene_graph(caption).tuples()
                   if len(t) == 1}
            total_m += len(got & objs)
            total_c += len(got)
            total_r += len(objs)
        assert total_m / total_c >= 0.85  # few spurious objects
        assert total_m / total_r >= 0.95  # almost no missed objects
