"""Pipelined serving tests (decoding/serve.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

import jax
import jax.numpy as jnp

from recurrent_fusion_network_tpu.decoding.serve import pipelined_decode, pipelined_map


class TestPipelinedMap:
    def test_preserves_order_and_results(self):
        f = jax.jit(lambda x: x * 2 + 1)
        items = [jnp.full((4,), i, jnp.float32) for i in range(7)]
        out = list(pipelined_map(f, items, depth=3))
        assert [int(i[0]) for i, _ in out] == list(range(7))
        for i, (item, res) in enumerate(out):
            np.testing.assert_allclose(np.asarray(res), 2.0 * i + 1)

    def test_depth_window(self):
        """At most `depth` dispatches happen before the first yield."""
        calls = []

        def f(x):
            calls.append(x)
            return x

        gen = pipelined_map(f, range(10), depth=2)
        first = next(gen)
        assert first == (0, 0)
        assert calls == [0, 1, 2]  # window filled to depth+1 then yields

    def test_depth_validation(self):
        with pytest.raises(ValueError):
            list(pipelined_map(lambda x: x, [1], depth=0))

    def test_decode_stream_matches_sequential(self):
        """pipelined_decode over real model batches == the sequential loop."""
        from recurrent_fusion_network_tpu.data.synthetic import synthetic_setup
        from recurrent_fusion_network_tpu.decoding.api import model_sample
        from recurrent_fusion_network_tpu.models import setup
        from recurrent_fusion_network_tpu.training.eval_split import (
            batch_feats,
            dedupe_feats,
        )

        opt, loader = synthetic_setup(caption_model="show_tell", batch_size=4)
        opt.vocab_size, opt.seq_length = loader.vocab_size, loader.seq_length
        model = setup(opt)
        params = model.init_params(jax.random.PRNGKey(0))
        decode = jax.jit(
            lambda f, a: model_sample(model, params, f, a, beam_size=2)
        )

        batches = []
        for _ in range(4):
            d = loader.get_batch("val")
            fc, att = batch_feats(d)
            batches.append(dedupe_feats(fc, att, loader.batch_size,
                                        loader.seq_per_img))

        want = [np.asarray(decode(*b).seq) for b in batches]
        got = [np.asarray(out.seq)
               for _, out in pipelined_decode(decode, batches, depth=2)]
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)
