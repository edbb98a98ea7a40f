"""Root-CLI checkpoint-backend regression: a run trained with
--checkpoint_backend orbax must be EVALUABLE through the same flag — the
r3 review found eval.py/eval_ensemble.py resolving the pickle loader
directly while serve.py honored the backend (reference surface: eval.py /
eval_ensemble.py opt merging, train.py:87-88 checkpoint contract)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=600):
    # subprocess CLIs must NOT register the axon TPU backend (conftest's CPU
    # pin only covers this process): drop the axon trigger env and pin cpu
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


def test_orbax_checkpoint_is_evaluable_via_cli(tmp_path):
    ck = str(tmp_path / "ck")
    os.makedirs(ck, exist_ok=True)
    common = ["--caption_model", "show_tell", "--feature_type", "synthetic",
              "--checkpoint_backend", "orbax", "--id", "ox",
              "--rnn_size", "32", "--input_encoding_size", "32",
              "--batch_size", "4", "--val_images_use", "4"]
    r = run_cli(["main.py", *common, "--checkpoint_path", ck,
                 "--max_iterations", "3", "--save_checkpoint_every", "2",
                 "--losses_log_every", "1", "--language_eval", "0"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isdir(os.path.join(ck, "model_ox_0-best.orbax")), (
        os.listdir(ck))

    r = run_cli(["eval.py", "--model_path", ck, "--load_model_id", "ox",
                 "--checkpoint_backend", "orbax", "--feature_type",
                 "synthetic", "--eval_split", "val", "--beam_size", "1",
                 "--language_eval", "0", "--batch_size", "4",
                 "--val_images_use", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "loss:" in r.stdout, r.stdout[-2000:]

    r = run_cli(["eval_ensemble.py", "--model_path", ck, "--model_ids", "ox",
                 "--checkpoint_backend", "orbax", "--feature_type",
                 "synthetic", "--eval_split", "val", "--beam_size", "1",
                 "--language_eval", "0", "--batch_size", "4",
                 "--val_images_use", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
