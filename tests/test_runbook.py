"""COCO runbook (scripts/run_coco.sh) consistency guards."""

import os
import re
import subprocess

import pytest

pytestmark = pytest.mark.quick

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_coco.sh")


class TestRunbook:
    def test_bash_syntax(self):
        for sh in sorted(os.listdir(os.path.join(REPO, "scripts"))):
            if sh.endswith(".sh"):
                subprocess.check_call(
                    ["bash", "-n", os.path.join(REPO, "scripts", sh)]
                )

    def test_encoder_table_matches_registry(self):
        """The runbook's 5-encoder extraction table must agree with
        feat_registry: same names, and att grids whose squares equal each
        registry att_num (the r3 dry-run crash was a grid mismatch)."""
        from recurrent_fusion_network_tpu import feat_registry

        text = open(SCRIPT).read()
        rows = re.findall(
            r'^\s*"(\w+)\s+(\S+)\s+(\d+)\s+(\d+)\s+(\S+)"\s*$',
            text, re.M,
        )
        assert len(rows) == 5, rows
        infos = {i.name: i for i in feat_registry.feat_array_info()}
        assert [r[0] for r in rows] == [i.name for i in
                                        feat_registry.feat_array_info()]
        for name, arch, att, imsz, wfile in rows:
            assert int(att) ** 2 == infos[name].att_num, (name, att)
        # native grid sizes: stride-32 backbones (resnet/densenet) must
        # satisfy image_size/32 == att; inception stacks use 299 -> 8x8
        for name, arch, att, imsz, wfile in rows:
            if name in ("resnet", "densenet"):
                assert int(imsz) // 32 == int(att), (name, imsz, att)
            else:
                assert (int(imsz), int(att)) == (299, 8), (name, imsz)

    def test_every_stage_gated(self):
        text = open(SCRIPT).read()
        for stage in ("prepro", "features", "xe", "rl", "eval"):
            assert f"has_stage {stage}" in text, stage
        assert "set -o pipefail" in text
