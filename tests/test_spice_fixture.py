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
    # ---- r4 expansion (VERDICT r3 item 4): relations-heavy, compound
    # prepositions, plurals, cardinality, partitives, multi-clause.
    # Targets remain CONVENTION-derived (Stanford scene-graph-parser
    # conventions), not parser-derived — known chunker deviations are
    # marked and absorbed by the floor, not baked into the targets.
    (
        "five people sitting on a bench in front of a building",
        {("people",), ("bench",), ("building",)},
        {("people", "5")},
        {("people", "sit on", "bench"), ("people", "in front of", "building")},
    ),
    (
        "a woman in a red dress standing next to a parked car",
        {("woman",), ("dress",), ("car",)},
        {("dress", "red"), ("car", "park")},
        {("woman", "in", "dress"), ("woman", "stand next to", "car")},
    ),
    (
        "a group of zebras grazing in a field of tall grass",
        {("group",), ("zebra",), ("field",), ("grass",)},
        {("grass", "tall")},
        {("group", "of", "zebra"), ("group", "graze in", "field"),
         ("field", "of", "grass")},
    ),
    (
        "a dog jumping over a fallen tree in the forest",
        {("dog",), ("tree",), ("forest",)},
        {("tree", "fallen")},
        {("dog", "jump over", "tree"), ("dog", "in", "forest")},
    ),
    (
        "a cat sitting under a wooden chair near the window",
        {("cat",), ("chair",), ("window",)},
        {("chair", "wooden")},
        {("cat", "sit under", "chair"), ("cat", "near", "window")},
    ),
    (
        "several boats floating on the water near a dock",
        {("boat",), ("water",), ("dock",)},
        set(),
        {("boat", "float on", "water"), ("boat", "near", "dock")},
    ),
    (
        "an old man with a white beard reading a newspaper",
        {("man",), ("beard",), ("newspaper",)},
        {("man", "old"), ("beard", "white")},
        {("man", "with", "beard"), ("man", "read", "newspaper")},
    ),
    (
        "a pizza topped with cheese and mushrooms on a metal tray",
        {("pizza",), ("cheese",), ("mushroom",), ("tray",)},
        {("tray", "metal")},
        {("pizza", "top with", "cheese"), ("pizza", "top with", "mushroom"),
         ("pizza", "on", "tray")},
    ),
    (
        "a little boy holding a baseball bat at a game",
        {("boy",), ("bat",), ("game",)},
        {("boy", "little"), ("bat", "baseball")},
        {("boy", "hold", "bat"), ("boy", "at", "game")},
    ),
    (
        "two men and a woman walking along the sidewalk",
        {("man",), ("woman",), ("sidewalk",)},
        {("man", "2")},
        {("man", "walk along", "sidewalk"), ("woman", "walk along", "sidewalk")},
    ),
    (
        "the kitchen has white cabinets and a large refrigerator",
        {("kitchen",), ("cabinet",), ("refrigerator",)},
        {("cabinet", "white"), ("refrigerator", "large")},
        {("kitchen", "have", "cabinet"), ("kitchen", "have", "refrigerator")},
    ),
    (
        "a bird perched on top of a street sign",
        {("bird",), ("sign",)},
        {("sign", "street")},
        {("bird", "perch on top of", "sign")},
    ),
    (
        "a herd of elephants walking across a dusty road",
        {("herd",), ("elephant",), ("road",)},
        {("road", "dusty")},
        {("herd", "of", "elephant"), ("herd", "walk across", "road")},
    ),
    (
        "a laptop computer sitting on a desk beside a lamp",
        {("computer",), ("desk",), ("lamp",)},
        {("computer", "laptop")},
        {("computer", "sit on", "desk"), ("computer", "beside", "lamp")},
    ),
    (
        "a train traveling down the tracks through the countryside",
        {("train",), ("track",), ("countryside",)},
        set(),
        {("train", "travel down", "track"), ("train", "through", "countryside")},
    ),
    (
        "a young child eating a slice of chocolate cake",
        {("child",), ("slice",), ("cake",)},
        {("child", "young"), ("cake", "chocolate")},
        {("child", "eat", "slice"), ("slice", "of", "cake")},
    ),
    (
        "a bathroom with a white toilet and a glass shower",
        {("bathroom",), ("toilet",), ("shower",)},
        {("toilet", "white"), ("shower", "glass")},
        {("bathroom", "with", "toilet"), ("bathroom", "with", "shower")},
    ),
    (
        "four motorcycles parked in a row on the street",
        {("motorcycle",), ("row",), ("street",)},
        {("motorcycle", "4")},
        {("motorcycle", "park in", "row"), ("motorcycle", "on", "street")},
    ),
    (
        "a man in a blue shirt throwing a frisbee to a brown dog",
        {("man",), ("shirt",), ("frisbee",), ("dog",)},
        {("shirt", "blue"), ("dog", "brown")},
        {("man", "in", "shirt"), ("man", "throw", "frisbee"),
         ("man", "to", "dog")},
    ),
    (
        "a clock mounted on the side of a brick building",
        {("clock",), ("building",)},
        {("building", "brick")},
        {("clock", "mount on side of", "building")},
    ),
    (
        # known deviation: the chunker re-anchors "with" to the clause
        # subject (sign-with-door) where the convention attaches it to the
        # nearest NP (house-with-door)
        "a stop sign in front of a white house with a red door",
        {("sign",), ("house",), ("door",)},
        {("sign", "stop"), ("house", "white"), ("door", "red")},
        {("sign", "in front of", "house"), ("house", "with", "door")},
    ),
    (
        "a vase filled with yellow flowers sitting on a window sill",
        {("vase",), ("flower",), ("sill",)},
        {("flower", "yellow"), ("sill", "window")},
        {("vase", "fill with", "flower"), ("vase", "sit on", "sill")},
    ),
    (
        "a double decker bus driving down a busy city street",
        {("bus",), ("street",)},
        {("bus", "double"), ("bus", "decker"), ("street", "busy"),
         ("street", "city")},
        {("bus", "drive down", "street")},
    ),
    (
        "six orange cones placed in the middle of the road",
        {("cone",), ("road",)},
        {("cone", "6"), ("cone", "orange")},
        {("cone", "place in middle of", "road")},
    ),
    (
        "a surfer riding a large wave in the ocean",
        {("surfer",), ("wave",), ("ocean",)},
        {("wave", "large")},
        {("surfer", "ride", "wave"), ("surfer", "in", "ocean")},
    ),
    (
        "a plate with a sandwich and a cup of coffee",
        {("plate",), ("sandwich",), ("cup",), ("coffee",)},
        set(),
        {("plate", "with", "sandwich"), ("plate", "with", "cup"),
         ("cup", "of", "coffee")},
    ),
    (
        "a person standing between two parked cars",
        {("person",), ("car",)},
        {("car", "2"), ("car", "park")},
        {("person", "stand between", "car")},
    ),
    (
        "a teddy bear lying on a bed next to a pillow",
        {("bear",), ("bed",), ("pillow",)},
        {("bear", "teddy")},
        {("bear", "lie on", "bed"), ("bear", "next to", "pillow")},
    ),
    (
        "a man is cutting a cake while a woman watches",
        {("man",), ("cake",), ("woman",)},
        set(),
        {("man", "cut", "cake")},
    ),
    (
        "a batter swinging at a ball during a baseball game",
        {("batter",), ("ball",), ("game",)},
        {("game", "baseball")},
        {("batter", "swing at", "ball"), ("batter", "during", "game")},
    ),
    (
        "an airplane flying above the clouds in a blue sky",
        {("airplane",), ("cloud",), ("sky",)},
        {("sky", "blue")},
        {("airplane", "fly above", "cloud"), ("airplane", "in", "sky")},
    ),
    (
        "two giraffes eating leaves from the top of a tree",
        {("giraffe",), ("leaf",), ("tree",)},
        {("giraffe", "2")},
        {("giraffe", "eat", "leaf"), ("giraffe", "from top of", "tree")},
    ),
    (
        "a bowl of soup sitting on a table near a spoon",
        {("bowl",), ("soup",), ("table",), ("spoon",)},
        set(),
        {("bowl", "of", "soup"), ("bowl", "sit on", "table"),
         ("bowl", "near", "spoon")},
    ),
    (
        "the bananas are yellow and the apples are red",
        {("banana",), ("apple",)},
        {("banana", "yellow"), ("apple", "red")},
        set(),
    ),
    (
        "a police officer riding a horse down a city street",
        {("officer",), ("horse",), ("street",)},
        {("officer", "police"), ("street", "city")},
        {("officer", "ride", "horse"), ("officer", "down", "street")},
    ),
    (
        "seven sheep grazing on a grassy hillside under a cloudy sky",
        {("sheep",), ("hillside",), ("sky",)},
        {("sheep", "7"), ("hillside", "grassy"), ("sky", "cloudy")},
        {("sheep", "graze on", "hillside"), ("sheep", "under", "sky")},
    ),
    (
        "a fire hydrant painted red and white on the sidewalk",
        {("hydrant",), ("sidewalk",)},
        {("hydrant", "fire"), ("hydrant", "red"), ("hydrant", "white")},
        {("hydrant", "on", "sidewalk")},
    ),
    (
        "a man wearing a black jacket and a gray scarf",
        {("man",), ("jacket",), ("scarf",)},
        {("jacket", "black"), ("scarf", "gray")},
        {("man", "wear", "jacket"), ("man", "wear", "scarf")},
    ),
    (
        "a computer monitor on a desk in a dark office",
        {("monitor",), ("desk",), ("office",)},
        {("monitor", "computer"), ("office", "dark")},
        {("monitor", "on", "desk"), ("monitor", "in", "office")},
    ),
    (
        "a boat sailing across a calm lake at sunset",
        {("boat",), ("lake",), ("sunset",)},
        {("lake", "calm")},
        {("boat", "sail across", "lake"), ("boat", "at", "sunset")},
    ),
    (
        "a crowd of people watching a tennis match",
        {("crowd",), ("people",), ("match",)},
        {("match", "tennis")},
        {("crowd", "of", "people"), ("crowd", "watch", "match")},
    ),
    (
        "two cats are sleeping on top of a parked car",
        {("cat",), ("car",)},
        {("cat", "2"), ("car", "park")},
        {("cat", "sleep on top of", "car")},
    ),
    (
        "a child flying a colorful kite in an open field",
        {("child",), ("kite",), ("field",)},
        {("kite", "colorful"), ("field", "open")},
        {("child", "fly", "kite"), ("child", "in", "field")},
    ),
    (
        "a bus stopped at a bus stop beside the road",
        {("bus",), ("stop",), ("road",)},
        {("stop", "bus")},
        {("bus", "stop at", "stop"), ("bus", "beside", "road")},
    ),
    (
        "an umbrella leaning against a wall near a door",
        {("umbrella",), ("wall",), ("door",)},
        set(),
        {("umbrella", "lean against", "wall"), ("umbrella", "near", "door")},
    ),
    (
        "a truck carrying hay driving through a rural area",
        {("truck",), ("hay",), ("area",)},
        {("area", "rural")},
        {("truck", "carry", "hay"), ("truck", "drive through", "area")},
    ),
    (
        # known deviation: "around" re-anchors to the subject (dog) where
        # the convention attaches it to the nearest NP (collar-around-neck)
        "the dog has a red collar around its neck",
        {("dog",), ("collar",), ("neck",)},
        {("collar", "red")},
        {("dog", "have", "collar"), ("collar", "around", "neck")},
    ),
    (
        "a woman holding an umbrella walking in the rain",
        {("woman",), ("umbrella",), ("rain",)},
        set(),
        {("woman", "hold", "umbrella"), ("woman", "walk in", "rain")},
    ),
    (
        "a bench underneath a tree beside a stone path",
        {("bench",), ("tree",), ("path",)},
        {("path", "stone")},
        {("bench", "underneath", "tree"), ("bench", "beside", "path")},
    ),
    (
        "a refrigerator covered with magnets in a small kitchen",
        {("refrigerator",), ("magnet",), ("kitchen",)},
        {("kitchen", "small")},
        {("refrigerator", "cover with", "magnet"),
         ("refrigerator", "in", "kitchen")},
    ),
    (
        "eight ducks swimming in a pond behind a fence",
        {("duck",), ("pond",), ("fence",)},
        {("duck", "8")},
        {("duck", "swim in", "pond"), ("duck", "behind", "fence")},
    ),
    (
        "a tall giraffe standing next to a short zebra",
        {("giraffe",), ("zebra",)},
        {("giraffe", "tall"), ("zebra", "short")},
        {("giraffe", "stand next to", "zebra")},
    ),
    (
        "a slice of pizza on a paper plate with a napkin",
        {("slice",), ("pizza",), ("plate",), ("napkin",)},
        {("plate", "paper")},
        {("slice", "of", "pizza"), ("slice", "on", "plate"),
         ("slice", "with", "napkin")},
    ),
    (
        "a man and a dog sitting inside a small boat",
        {("man",), ("dog",), ("boat",)},
        {("boat", "small")},
        {("man", "sit inside", "boat"), ("dog", "sit inside", "boat")},
    ),
    (
        "a traffic light hanging over a busy intersection",
        {("light",), ("intersection",)},
        {("light", "traffic"), ("intersection", "busy")},
        {("light", "hang over", "intersection")},
    ),
    (
        "a bookshelf full of old books against the wall",
        {("bookshelf",), ("book",), ("wall",)},
        {("book", "old")},
        {("bookshelf", "full of", "book"), ("bookshelf", "against", "wall")},
    ),
    (
        "a man holding a cake that has candles on it",
        {("man",), ("cake",), ("candle",)},
        set(),
        {("man", "hold", "cake"), ("cake", "have", "candle")},
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
        # r4 measured mean 0.996 over the 67-caption fixture (the only
        # sub-1.0 scores are the two marked PP-attachment deviation cases,
        # 0.83/0.88); assert a floor near the measured mean so chunker
        # regressions surface, with slack for future convention-faithful
        # target additions the chunker won't fully match
        assert mean >= 0.9, sorted(scores, key=lambda t: t[1])[:10]
        # no caption should collapse entirely
        for caption, s in scores:
            assert s >= 0.6, (caption, s)

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
