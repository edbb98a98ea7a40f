"""Feature-extraction tests: augmentation semantics, adaptive pooling parity
with torch, backbone shapes, torch state-dict conversion, end-to-end CLI."""

import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from recurrent_fusion_network_tpu.data.feature_extraction.augment import (
    VARIANT_BOXES,
    make_variant,
    make_variants,
)
from recurrent_fusion_network_tpu.data.feature_extraction.resnet_jax import (
    ResNetConfig,
    _torch_adaptive_pool,
    load_torch_state_dict,
    resnet_features,
    resnet_init,
)


class TestAugment:
    def test_flip(self, rng):
        img = jnp.asarray(rng.random((8, 6, 3)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(make_variant(img, "flip")), np.asarray(img)[:, ::-1]
        )

    def test_crop_box_semantics(self, rng):
        img = jnp.asarray(rng.random((20, 20, 3)), jnp.float32)
        out = make_variant(img, "crop_tl")
        assert out.shape == img.shape
        # top-left 90% crop resized back: top-left corner pixel preserved
        np.testing.assert_allclose(
            np.asarray(out[0, 0]), np.asarray(img[0, 0]), rtol=1e-5
        )

    def test_flip_crop_composition(self, rng):
        img = jnp.asarray(rng.random((20, 20, 3)), jnp.float32)
        manual = make_variant(make_variant(img, "flip"), "crop_br")
        composed = make_variant(img, "flip_crop_br")
        np.testing.assert_allclose(np.asarray(composed), np.asarray(manual), rtol=1e-6)

    def test_all_variants(self, rng):
        img = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
        out = make_variants(img)
        assert len(out) == 10
        for v, arr in out.items():
            assert arr.shape == img.shape, v

    @staticmethod
    def _tf_crop_and_resize_ref(img, box):
        """Independent numpy port of tf.image.crop_and_resize single-box
        bilinear semantics (the reference's generate_crop_images.py:13-50):
        corner-aligned sampling over [lo*(extent-1), hi*(extent-1)]."""
        H, W, C = img.shape
        y1, x1, y2, x2 = box
        ys = y1 * (H - 1) + np.arange(H) * (y2 - y1) * (H - 1) / (H - 1)
        xs = x1 * (W - 1) + np.arange(W) * (x2 - x1) * (W - 1) / (W - 1)
        out = np.empty_like(img)
        for i, y in enumerate(ys):
            y0 = int(np.floor(y))
            wy = y - y0
            y0c, y1c = min(max(y0, 0), H - 1), min(max(y0 + 1, 0), H - 1)
            for j, x in enumerate(xs):
                x0 = int(np.floor(x))
                wx = x - x0
                x0c, x1c = min(max(x0, 0), W - 1), min(max(x0 + 1, 0), W - 1)
                top = img[y0c, x0c] * (1 - wx) + img[y0c, x1c] * wx
                bot = img[y1c, x0c] * (1 - wx) + img[y1c, x1c] * wx
                out[i, j] = top * (1 - wy) + bot * wy
        return out

    def test_crop_matches_tf_crop_and_resize(self, rng):
        """The crop variants must reproduce tf.image.crop_and_resize's
        fractional corner-aligned grid — NOT an integer-pixel slice plus
        half-pixel resize, whose every sample differs sub-pixel-wise from
        the reference's pre-rendered crop images."""
        from recurrent_fusion_network_tpu.data.feature_extraction.augment import (
            VARIANT_BOXES,
            crop_and_resize,
        )

        img = np.asarray(rng.random((6, 5, 2)), np.float32)
        for name, box in VARIANT_BOXES.items():
            got = np.asarray(crop_and_resize(jnp.asarray(img), box))
            want = self._tf_crop_and_resize_ref(img, box)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                       err_msg=name)
        # the identity box is exactly the identity under corner alignment
        ident = np.asarray(crop_and_resize(jnp.asarray(img), (0.0, 0.0, 1.0, 1.0)))
        np.testing.assert_allclose(ident, img, rtol=1e-6, atol=1e-7)


class TestAdaptivePool:
    @pytest.mark.parametrize("H,W,S", [(7, 7, 7), (13, 17, 14), (20, 20, 14)])
    def test_matches_torch(self, rng, H, W, S):
        x = rng.standard_normal((2, H, W, 5)).astype(np.float32)
        ours = _torch_adaptive_pool(jnp.asarray(x), S)
        want = F.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (S, S)
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-4, atol=1e-6)


class TestResNet:
    def test_tiny_backbone_shapes(self):
        cfg = ResNetConfig(blocks=(1, 1, 1, 1), width=8, att_size=2)
        params = resnet_init(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        fc, att = resnet_features(params, imgs, cfg)
        assert fc.shape == (2, 256)
        assert att.shape == (2, 2, 2, 256)
        assert np.isfinite(np.asarray(fc)).all()

    def test_torch_state_dict_roundtrip(self):
        """Converted torch weights produce the same structure/shapes as
        resnet_init, and conv transposition is applied."""
        cfg = ResNetConfig(blocks=(1, 1, 1, 1), width=8, att_size=2)
        ours = resnet_init(jax.random.PRNGKey(0), cfg)
        # synthesize a torch-format state dict matching the tiny config
        sd = {}
        g = np.random.default_rng(0)

        def put_conv(name, hwio):
            sd[name] = torch.from_numpy(
                np.transpose(g.standard_normal(hwio).astype(np.float32), (3, 2, 0, 1))
            )

        def put_bn(prefix, c):
            sd[prefix + ".weight"] = torch.ones(c)
            sd[prefix + ".bias"] = torch.zeros(c)
            sd[prefix + ".running_mean"] = torch.zeros(c)
            sd[prefix + ".running_var"] = torch.ones(c)

        put_conv("conv1.weight", (7, 7, 3, 8))
        put_bn("bn1", 8)
        cin = 8
        for stage in range(1, 5):
            planes = 8 * 2 ** (stage - 1)
            cout = planes * 4
            pre = f"layer{stage}.0"
            put_conv(pre + ".conv1.weight", (1, 1, cin, planes))
            put_bn(pre + ".bn1", planes)
            put_conv(pre + ".conv2.weight", (3, 3, planes, planes))
            put_bn(pre + ".bn2", planes)
            put_conv(pre + ".conv3.weight", (1, 1, planes, cout))
            put_bn(pre + ".bn3", cout)
            put_conv(pre + ".downsample.0.weight", (1, 1, cin, cout))
            put_bn(pre + ".downsample.1", cout)
            cin = cout
        conv_params = load_torch_state_dict(sd, cfg)
        ref_tree = jax.tree_util.tree_structure(ours)
        got_tree = jax.tree_util.tree_structure(conv_params)
        assert ref_tree == got_tree
        for a, b in zip(jax.tree_util.tree_leaves(ours), jax.tree_util.tree_leaves(conv_params)):
            assert a.shape == b.shape
        # runs
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        fc, att = resnet_features(conv_params, imgs, cfg)
        assert np.isfinite(np.asarray(fc)).all()

    def test_torch_numeric_golden(self):
        """NUMERIC converter validation (VERDICT round-1 item 8): build a
        real torch ResNet (torchvision architecture + the reference's
        myResnet feature taps, resnet_utils.py:12-40) at tiny dims with
        random weights, push its state_dict through load_torch_state_dict,
        and require the JAX forward to match torch's fc/att features."""
        import torch.nn as tnn

        width = 8

        class Bottleneck(tnn.Module):
            def __init__(self, cin, planes, stride):
                super().__init__()
                cout = planes * 4
                self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                        padding=1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
                self.bn3 = tnn.BatchNorm2d(cout)
                self.downsample = None
                if stride != 1 or cin != cout:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                        tnn.BatchNorm2d(cout),
                    )

            def forward(self, x):
                out = torch.relu(self.bn1(self.conv1(x)))
                out = torch.relu(self.bn2(self.conv2(out)))
                out = self.bn3(self.conv3(out))
                idn = x if self.downsample is None else self.downsample(x)
                return torch.relu(out + idn)

        class TinyResNet(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, width, 7, stride=2, padding=3,
                                        bias=False)
                self.bn1 = tnn.BatchNorm2d(width)
                self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
                cin = width
                for stage in range(1, 5):
                    planes = width * 2 ** (stage - 1)
                    stride = 1 if stage == 1 else 2
                    setattr(self, f"layer{stage}",
                            tnn.Sequential(Bottleneck(cin, planes, stride)))
                    cin = planes * 4

            def forward(self, x):
                x = torch.relu(self.bn1(self.conv1(x)))
                x = self.maxpool(x)
                for stage in range(1, 5):
                    x = getattr(self, f"layer{stage}")(x)
                # myResnet taps (resnet_utils.py:30-36): fc = spatial mean,
                # att = adaptive avg pool to SxS
                fc = x.mean(3).mean(2)
                att = F.adaptive_avg_pool2d(x, (2, 2))
                return fc, att

        torch.manual_seed(0)
        net = TinyResNet().eval()
        # non-trivial BN statistics so the test catches mean/var swaps
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.uniform_(-0.2, 0.2)

        cfg = ResNetConfig(blocks=(1, 1, 1, 1), width=width, att_size=2)
        params = load_torch_state_dict(net.state_dict(), cfg)

        g = np.random.default_rng(3)
        imgs = g.random((2, 64, 64, 3)).astype(np.float32)
        fc_j, att_j = resnet_features(params, jnp.asarray(imgs), cfg)

        from recurrent_fusion_network_tpu.data.feature_extraction.resnet_jax import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        x_t = ((imgs - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
               ).astype(np.float32)
        with torch.no_grad():
            fc_t, att_t = net(torch.from_numpy(x_t.transpose(0, 3, 1, 2)))
        # tolerance is loose enough for BLAS reduction-order jitter under
        # host contention (observed one suite-order flake at 2e-4) but tight
        # enough that any transposition/BN-parameter bug (O(1) error) fails
        np.testing.assert_allclose(np.asarray(fc_j), fc_t.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(att_j), att_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4,
        )


class TestExtractCLI:
    def test_end_to_end_packed_output(self, tmp_path):
        from PIL import Image

        from recurrent_fusion_network_tpu.data.dataset import PackedFeatureSource
        from recurrent_fusion_network_tpu.data.feature_extraction.extract import main

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        g = np.random.default_rng(0)
        for i in range(3):
            arr = (g.random((40, 52, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"COCO_val2014_{1000+i:012d}.jpg")
        out = tmp_path / "packed"
        main([
            "--images_dir", str(img_dir), "--output_dir", str(out),
            "--arch", "resnet50", "--image_size", "64", "--att_size", "2",
            "--batch_size", "2", "--variants", "original,flip",
        ])
        src = PackedFeatureSource(str(out))
        fc, att = src.load(1000, "original")
        assert fc.shape == (2048,)
        assert att.shape == (4, 2048)
        fc_f, _ = src.load(1001, "flip")
        assert np.isfinite(fc_f).all()
        ids = json.load(open(out / "ids.json"))
        assert ids == [1000, 1001, 1002]

    def test_native_geometry_defaults(self):
        from recurrent_fusion_network_tpu.data.feature_extraction.extract import (
            default_geometry,
        )

        assert default_geometry("resnet101") == (448, 14)
        assert default_geometry("densenet161") == (224, 7)
        assert default_geometry("inception_v3") == (299, 8)
        assert default_geometry("inception_resnet_v2") == (299, 8)
        with pytest.raises(ValueError):
            default_geometry("vgg16")

    def test_inconsistent_geometry_rejected_before_io(self, tmp_path):
        """Inception grids are fixed by the input size (backbones ignore
        att_size there); a mismatched --att_size must die with a clear
        message BEFORE any array IO — previously it crashed on the first
        batch's reshape after a minutes-long backbone compile."""
        from PIL import Image

        from recurrent_fusion_network_tpu.data.feature_extraction.extract import main

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        arr = (np.random.default_rng(0).random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / "7000.jpg")
        out = tmp_path / "packed"
        with pytest.raises(SystemExit, match="att grid"):
            main([
                "--images_dir", str(img_dir), "--output_dir", str(out),
                "--arch", "inception_v3", "--image_size", "299",
                "--att_size", "14", "--batch_size", "1",
            ])
        assert not out.exists()  # rejected before creating anything

    def test_interrupted_extraction_resumes_exactly(self, tmp_path):
        """A preempted extraction (progress marker behind N) re-run with the
        same command refills ONLY the missing rows and ends byte-identical
        to an uninterrupted run — COCO-scale extraction is hours per
        encoder, so losing it to a preemption is not acceptable."""
        from PIL import Image

        from recurrent_fusion_network_tpu.data.feature_extraction.extract import main

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        g = np.random.default_rng(1)
        for i in range(5):
            arr = (g.random((40, 52, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"COCO_val2014_{2000+i:012d}.jpg")

        common = ["--images_dir", str(img_dir), "--arch", "resnet50",
                  "--image_size", "64", "--att_size", "2",
                  "--batch_size", "2", "--variants", "original"]
        ref = tmp_path / "ref"
        main(common + ["--output_dir", str(ref)])

        out = tmp_path / "packed"
        main(common + ["--output_dir", str(out)])
        # simulate a preemption after the first batch: rewind the marker
        # and poison the rows past it
        prog = json.load(open(out / "progress.json"))
        assert prog["done"] == 5
        prog["done"] = 2
        json.dump(prog, open(out / "progress.json", "w"))
        fc = np.lib.format.open_memmap(out / "original_fc.npy", mode="r+")
        fc[2:] = np.nan
        fc.flush()
        del fc

        main(common + ["--output_dir", str(out)])  # resume
        assert json.load(open(out / "progress.json"))["done"] == 5
        got = np.load(out / "original_fc.npy")
        want = np.load(ref / "original_fc.npy")
        assert np.isfinite(got).all()
        np.testing.assert_array_equal(got, want)
        # rows before the marker were NOT recomputed blindly from zero:
        # the resume loop started at the marker (observable because row 0/1
        # survive the nan-poisoning untouched — equal is enough here)
        # a mismatched work list starts fresh instead of mixing rows
        (img_dir / "COCO_val2014_000000002005.jpg").write_bytes(
            open(img_dir / "COCO_val2014_000000002000.jpg", "rb").read()
        )
        main(common + ["--output_dir", str(out)])
        assert json.load(open(out / "progress.json"))["done"] == 6

    def test_ids_json_is_a_completion_marker(self, tmp_path, monkeypatch):
        """ids.json must exist IFF the directory is complete. A fresh
        restart over a previously completed dir zero-truncates the arrays,
        so a preemption before refilling them would otherwise leave a dir
        that LOOKS complete (stale ids.json) while rows past the marker are
        zeros — silently consumed by training. And a SIGTERM landing on the
        FINAL chunk is completion, not preemption: finalize in place rather
        than demanding a whole re-invocation to write ids.json."""
        import os
        import signal

        from PIL import Image

        from recurrent_fusion_network_tpu.data.feature_extraction import (
            extract,
        )

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        g = np.random.default_rng(7)
        for i in range(5):
            arr = (g.random((40, 52, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"{3000 + i}.jpg")
        out = tmp_path / "packed"
        common = ["--images_dir", str(img_dir), "--output_dir", str(out),
                  "--arch", "resnet50", "--image_size", "64",
                  "--att_size", "2", "--batch_size", "2",
                  "--variants", "original"]
        extract.main(common)
        assert (out / "ids.json").exists()

        # work-list change -> fresh restart; SIGTERM while loading the
        # middle chunk -> preempted mid-run. The stale ids.json must be
        # gone BEFORE any row is produced, and still gone afterwards.
        Image.fromarray((g.random((40, 52, 3)) * 255).astype(np.uint8)).save(
            img_dir / "3005.jpg"
        )
        state = {"calls": 0, "ids_at_first_load": None}
        real_load = extract.load_image

        def spying_load(path, size):
            if state["calls"] == 0:
                state["ids_at_first_load"] = (out / "ids.json").exists()
            state["calls"] += 1
            if os.path.basename(path) == "3002.jpg":  # middle chunk
                os.kill(os.getpid(), signal.SIGTERM)
            return real_load(path, size)

        monkeypatch.setattr(extract, "load_image", spying_load)
        extract.main(common)
        assert state["ids_at_first_load"] is False
        assert not (out / "ids.json").exists()
        prog = json.load(open(out / "progress.json"))
        assert 0 < prog["done"] < 6

        # resume with a SIGTERM during the FINAL chunk: completes anyway
        def final_chunk_sigterm(path, size):
            if os.path.basename(path) == "3005.jpg":  # last chunk
                os.kill(os.getpid(), signal.SIGTERM)
            return real_load(path, size)

        monkeypatch.setattr(extract, "load_image", final_chunk_sigterm)
        extract.main(common)
        assert json.load(open(out / "progress.json"))["done"] == 6
        assert json.load(open(out / "ids.json")) == list(range(3000, 3006))
        fc = np.load(out / "original_fc.npy")
        assert np.isfinite(fc).all()
        assert float(np.abs(fc).sum(axis=1).min()) > 0  # no zero rows


class TestImageFolderEval:
    def test_caption_raw_images_end_to_end(self, tmp_path):
        """--image_folder mode: raw images -> backbone features -> captions."""
        from PIL import Image

        from recurrent_fusion_network_tpu.models import ReviewNetModel
        from recurrent_fusion_network_tpu.training.eval_folder import eval_image_folder

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        g = np.random.default_rng(0)
        for i in range(3):
            arr = (g.random((32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"{i+1}.jpg")

        vocab = {str(i + 1): w for i, w in enumerate("a man dog park runs".split())}
        m = ReviewNetModel(
            vocab_size=len(vocab), seq_length=6, input_encoding_size=12,
            rnn_size=12, att_hid_size=12, fc_feat_size=2048,
            att_feat_size=2048, att_num=4, num_review_steps=2, top_words_count=4,
        )
        params = m.init_params(jax.random.PRNGKey(0))
        preds = eval_image_folder(
            m, params, vocab, str(img_dir),
            beam_size=2, batch_size=2, image_size=64,
            backbone_arch="resnet50", att_size=2,
        )
        assert len(preds) == 3
        assert {p["image_id"] for p in preds} == {1, 2, 3}
        for p in preds:
            assert isinstance(p["caption"], str)

    def test_feat_array_models_single_encoder_or_refused(self, tmp_path):
        """An M==1 RecurrentFusionModel works with the one backbone stream
        wrapped in a list; an M>1 model is refused with a clear message
        instead of an assert deep inside jit tracing (review r3)."""
        from PIL import Image

        from recurrent_fusion_network_tpu.models import RecurrentFusionModel
        from recurrent_fusion_network_tpu.training.eval_folder import (
            eval_image_folder,
        )

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        g = np.random.default_rng(1)
        Image.fromarray((g.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            img_dir / "7.jpg")

        vocab = {str(i + 1): w for i, w in enumerate("a man dog".split())}
        common = dict(vocab_size=len(vocab), seq_length=6,
                      input_encoding_size=12, rnn_size=12, att_hid_size=12,
                      num_review_steps=2, num_review_steps_0=2,
                      top_words_count=3)
        m1 = RecurrentFusionModel(fc_feat_sizes=(2048,),
                                  att_feat_sizes=(2048,), att_nums=(4,),
                                  **common)
        preds = eval_image_folder(
            m1, m1.init_params(jax.random.PRNGKey(0)), vocab, str(img_dir),
            beam_size=2, batch_size=1, image_size=64,
            backbone_arch="resnet50", att_size=2,
        )
        assert len(preds) == 1 and isinstance(preds[0]["caption"], str)

        m3 = RecurrentFusionModel(fc_feat_sizes=(2048, 8, 8),
                                  att_feat_sizes=(2048, 8, 8),
                                  att_nums=(4, 4, 4), **common)
        with pytest.raises(ValueError, match="encoder streams"):
            eval_image_folder(
                m3, None, vocab, str(img_dir), backbone_arch="resnet50",
                att_size=2, image_size=64,
            )


class TestDenseNet:
    def test_densenet161_feature_width(self):
        from recurrent_fusion_network_tpu.data.feature_extraction.densenet_jax import (
            DenseNetConfig,
        )

        assert DenseNetConfig.densenet161().out_features == 2208  # registry dim
        assert DenseNetConfig.densenet121().out_features == 1024

    def test_tiny_densenet_shapes(self):
        from recurrent_fusion_network_tpu.data.feature_extraction.densenet_jax import (
            DenseNetConfig,
            densenet_features,
            densenet_init,
        )

        cfg = DenseNetConfig(blocks=(2, 2, 2, 2), growth=8, init_features=16,
                             att_size=2)
        p = densenet_init(jax.random.PRNGKey(0), cfg)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        fc, att = densenet_features(p, imgs, cfg)
        assert fc.shape == (2, cfg.out_features)
        assert att.shape == (2, 2, 2, cfg.out_features)
        assert np.isfinite(np.asarray(fc)).all()

    def test_torch_state_dict_structure(self):
        from recurrent_fusion_network_tpu.data.feature_extraction.densenet_jax import (
            DenseNetConfig,
            densenet_init,
            load_torch_state_dict,
        )

        cfg = DenseNetConfig(blocks=(2, 2), growth=8, init_features=16, att_size=2)
        ours = densenet_init(jax.random.PRNGKey(0), cfg)
        sd = {}
        g = np.random.default_rng(0)

        def put_conv(name, hwio):
            sd[name] = torch.from_numpy(
                np.transpose(g.standard_normal(hwio).astype(np.float32), (3, 2, 0, 1))
            )

        def put_bn(prefix, c):
            sd[prefix + ".weight"] = torch.ones(c)
            sd[prefix + ".bias"] = torch.zeros(c)
            sd[prefix + ".running_mean"] = torch.zeros(c)
            sd[prefix + ".running_var"] = torch.ones(c)

        put_conv("features.conv0.weight", (7, 7, 3, 16))
        put_bn("features.norm0", 16)
        c = 16
        for bi, n in enumerate(cfg.blocks, start=1):
            for li in range(1, n + 1):
                pre = f"features.denseblock{bi}.denselayer{li}"
                put_bn(pre + ".norm1", c)
                put_conv(pre + ".conv1.weight", (1, 1, c, 32))
                put_bn(pre + ".norm2", 32)
                put_conv(pre + ".conv2.weight", (3, 3, 32, 8))
                c += 8
            if bi < len(cfg.blocks):
                put_bn(f"features.transition{bi}.norm", c)
                put_conv(f"features.transition{bi}.conv.weight", (1, 1, c, c // 2))
                c //= 2
        put_bn("features.norm5", c)
        converted = load_torch_state_dict(sd, cfg)
        assert jax.tree_util.tree_structure(ours) == jax.tree_util.tree_structure(converted)
        for a, b in zip(jax.tree_util.tree_leaves(ours), jax.tree_util.tree_leaves(converted)):
            assert a.shape == b.shape


class TestDenseNetNumericGolden:
    def test_torch_numeric_golden(self):
        """NUMERIC converter validation for DenseNet (same pattern as the
        ResNet golden): a tiny torch DenseNet with torchvision's features.*
        naming and randomized BN statistics, converted via
        load_torch_state_dict, must reproduce torch's fc/att features."""
        import torch.nn as tnn

        from recurrent_fusion_network_tpu.data.feature_extraction.densenet_jax import (
            DenseNetConfig,
            densenet_features,
        )
        from recurrent_fusion_network_tpu.data.feature_extraction.densenet_jax import (
            load_torch_state_dict as dn_load,
        )

        cfg = DenseNetConfig(blocks=(2, 2), growth=4, init_features=8,
                             bn_size=2, att_size=2)

        class DenseLayer(tnn.Module):
            def __init__(self, cin, growth, bn_size):
                super().__init__()
                inter = bn_size * growth
                self.norm1 = tnn.BatchNorm2d(cin)
                self.conv1 = tnn.Conv2d(cin, inter, 1, bias=False)
                self.norm2 = tnn.BatchNorm2d(inter)
                self.conv2 = tnn.Conv2d(inter, growth, 3, padding=1, bias=False)

            def forward(self, x):
                h = self.conv1(torch.relu(self.norm1(x)))
                h = self.conv2(torch.relu(self.norm2(h)))
                return torch.cat([x, h], 1)

        class TinyDenseNet(tnn.Module):
            def __init__(self):
                super().__init__()
                f = tnn.Module()
                f.conv0 = tnn.Conv2d(3, cfg.init_features, 7, stride=2,
                                     padding=3, bias=False)
                f.norm0 = tnn.BatchNorm2d(cfg.init_features)
                c = cfg.init_features
                for bi, n in enumerate(cfg.blocks, start=1):
                    block = tnn.Module()
                    for li in range(1, n + 1):
                        setattr(block, f"denselayer{li}",
                                DenseLayer(c, cfg.growth, cfg.bn_size))
                        c += cfg.growth
                    setattr(f, f"denseblock{bi}", block)
                    if bi < len(cfg.blocks):
                        t = tnn.Module()
                        t.norm = tnn.BatchNorm2d(c)
                        t.conv = tnn.Conv2d(c, c // 2, 1, bias=False)
                        setattr(f, f"transition{bi}", t)
                        c //= 2
                f.norm5 = tnn.BatchNorm2d(c)
                self.features = f

            def forward(self, x):
                f = self.features
                x = torch.relu(f.norm0(f.conv0(x)))
                x = F.max_pool2d(x, 3, stride=2, padding=1)
                for bi, n in enumerate(cfg.blocks, start=1):
                    block = getattr(f, f"denseblock{bi}")
                    for li in range(1, n + 1):
                        x = getattr(block, f"denselayer{li}")(x)
                    if bi < len(cfg.blocks):
                        t = getattr(f, f"transition{bi}")
                        x = F.avg_pool2d(t.conv(torch.relu(t.norm(x))), 2)
                x = torch.relu(f.norm5(x))
                fc = x.mean(3).mean(2)
                att = F.adaptive_avg_pool2d(x, (cfg.att_size, cfg.att_size))
                return fc, att

        torch.manual_seed(1)
        net = TinyDenseNet().eval()
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.uniform_(-0.2, 0.2)

        params = dn_load(net.state_dict(), cfg)
        g = np.random.default_rng(5)
        imgs = g.random((2, 64, 64, 3)).astype(np.float32)
        fc_j, att_j = densenet_features(params, jnp.asarray(imgs), cfg)

        from recurrent_fusion_network_tpu.data.feature_extraction.resnet_jax import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        x_t = ((imgs - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
               ).astype(np.float32)
        with torch.no_grad():
            fc_t, att_t = net(torch.from_numpy(x_t.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(fc_j), fc_t.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(att_j), att_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4,
        )


class TestInception:
    @pytest.mark.slow
    @pytest.mark.parametrize("arch,fc_dim,att_dim", [
        ("inception_v3", 2048, 1280),
        ("inception_v4", 1536, 1536),
        ("inception_resnet_v2", 1536, 1536),
    ])
    def test_registry_dims_at_canonical_input(self, arch, fc_dim, att_dim):
        """Each Inception variant must emit exactly the feat_registry dims
        (fc_feat_size / att_feat_size / att_num=64) at 299x299 input."""
        from recurrent_fusion_network_tpu.data.feature_extraction.inception_jax import (
            inception_features,
            inception_init,
        )

        p = inception_init(arch, jax.random.PRNGKey(0))
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 299, 299, 3))
        fc, att = inception_features(arch, p, imgs)
        assert fc.shape == (1, fc_dim)
        assert att.shape == (1, 8, 8, att_dim)  # att_num = 64
        assert np.isfinite(np.asarray(fc)).all()

    def test_backbone_dispatch(self):
        from recurrent_fusion_network_tpu.data.feature_extraction.backbones import (
            ARCHS,
            build_backbone,
        )

        assert "inception_v3" in ARCHS
        params, feats_fn, fc_dim, att_dim = build_backbone("inception_v3", 8)
        assert (fc_dim, att_dim) == (2048, 1280)
        assert att_dim == 1280


class TestTorchPaddingParity:
    """Stride-2 convs/pools must match torch's symmetric padding — XLA 'SAME'
    pads asymmetrically on even inputs and silently diverges with pretrained
    weights (code-review finding, verified)."""

    def test_stride2_conv_matches_torch(self, rng):
        from recurrent_fusion_network_tpu.data.feature_extraction.resnet_jax import conv

        for k, s in [(3, 2), (7, 2), (3, 1), (1, 2)]:
            x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
            w = rng.standard_normal((k, k, 4, 6)).astype(np.float32)
            pad = (k - 1) // 2
            want = torch.nn.functional.conv2d(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(w.transpose(3, 2, 0, 1)),
                stride=s, padding=pad,
            ).numpy().transpose(0, 2, 3, 1)
            got = np.asarray(conv(jnp.asarray(x), jnp.asarray(w), stride=s))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_maxpool_matches_torch(self, rng):
        from recurrent_fusion_network_tpu.data.feature_extraction.resnet_jax import max_pool

        x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        want = torch.nn.functional.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, stride=2, padding=1
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(max_pool(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5)
