"""Documentation drift guards.

Every `--flag` a user can copy out of README.md or docs/MIGRATION.md must
exist on the actual CLI surface (config defaults or a root CLI's argparse);
same for `rfnet-*` console scripts vs pyproject. The docs are the migration
path from the reference — a flag that drifted out of the code turns the
guide into misdirection.
"""

import os
import re

import pytest

pytestmark = pytest.mark.quick

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOCS = ["README.md", os.path.join("docs", "MIGRATION.md")]

# CLI sources whose argparse flags extend the config surface
CLI_SOURCES = [
    "eval.py",
    "eval_ensemble.py",
    "serve.py",
    "main.py",
    "main_rl.py",
    "bench.py",
    os.path.join("recurrent_fusion_network_tpu", "data", "prepro_labels.py"),
    os.path.join("recurrent_fusion_network_tpu", "data", "prepro_ngrams.py"),
    os.path.join("recurrent_fusion_network_tpu", "data",
                 "feature_extraction", "extract.py"),
    os.path.join("recurrent_fusion_network_tpu", "metrics",
                 "spice_server.py"),
    os.path.join("scripts", "load_test_serve.py"),
]


def cli_surface() -> set:
    from recurrent_fusion_network_tpu import config

    flags = set(config._defaults().keys())
    for path in CLI_SOURCES:
        src = open(os.path.join(REPO, path)).read()
        flags.update(re.findall(r'add_argument\(\s*"--(\w+)"', src))
    return flags


class TestDocsFlagDrift:
    @pytest.mark.parametrize("doc", DOCS)
    def test_every_documented_flag_exists(self, doc):
        text = open(os.path.join(REPO, doc)).read()
        # our flags are all snake_case; dashed tokens (curl's --data-binary)
        # belong to external tools. Reference-repo flag mentions need no
        # exclusion: they share names with ours by design.
        documented = {
            f for f in re.findall(r"--([\w-]+)", text) if "-" not in f
        }
        missing = documented - cli_surface()
        assert not missing, (
            f"{doc} documents flags that no CLI defines: {sorted(missing)}"
        )

    def test_console_scripts_match_pyproject(self):
        py = open(os.path.join(REPO, "pyproject.toml")).read()
        declared = set(re.findall(r'^(rfnet-[\w-]+)\s*=', py, re.M))
        for doc in DOCS:
            text = open(os.path.join(REPO, doc)).read()
            cited = set(re.findall(r"\b(rfnet-[\w-]+)\b", text))
            assert cited <= declared, (doc, sorted(cited - declared))

    def test_documented_scripts_exist(self):
        for doc in DOCS:
            text = open(os.path.join(REPO, doc)).read()
            # .sh only: docs also cite the REFERENCE's scripts/*.py paths
            # (its prepro lives under scripts/), which we ship elsewhere
            for rel in re.findall(r"\bscripts/([\w.]+\.sh)", text):
                assert os.path.exists(
                    os.path.join(REPO, "scripts", rel)
                ), (doc, rel)
            for rel in re.findall(r"`(docs/[\w./]+|PARITY\.md|PERF_NOTES\.md|"
                                  r"SURVEY\.md|BASELINE\.md)`", text):
                assert os.path.exists(os.path.join(REPO, rel)), (doc, rel)
