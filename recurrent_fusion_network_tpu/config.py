"""Option / flag system.

Mirrors the public surface of the reference's ``opts.py`` (reference:
opts.py:7-315): same flag names, same defaults, same post-parse validation,
plus the feature-path expansion from the encoder registry. Exposed both as an
argparse CLI parser (``parse_opt``) and as a plain mutable namespace
(``Options``) constructible programmatically for tests and library use.
"""

from __future__ import annotations

import argparse
from types import SimpleNamespace
from typing import Optional, Sequence

from . import feat_registry


class Options(SimpleNamespace):
    """Mutable option namespace with reference-compatible attribute names."""

    def __init__(self, **overrides):
        super().__init__(**_defaults())
        for k, v in overrides.items():
            setattr(self, k, v)
        finalize_options(self)


def _defaults() -> dict:
    """Default values for every flag, matching reference opts.py defaults."""
    return dict(
        # Data input settings (reference: opts.py:9-41)
        input_json="data/cocotalk.json",
        input_label_h5="data/cocotalk_label.h5",
        start_from=None,
        top_words_path="data/vocab_train.pkl",
        top_words_count=1000,
        feature_type="inception_v3",
        official_train_id_file="data/official_split/official_train_id.txt",
        official_val_id_file="data/official_split/official_val_id.txt",
        official_test_id_file="data/official_split/official_test_id.txt",
        use_official_split=0,
        use_flip=0,
        use_crop=0,
        aug_type=0,
        use_label_smoothing=0,
        label_smoothing_epsilon=0.1,
        use_mos=0,
        num_expert=10,
        # Model settings (reference: opts.py:52-65)
        caption_model="show_tell",
        rnn_size=512,
        num_layers=1,
        rnn_type="lstm",
        input_encoding_size=512,
        att_hid_size=512,
        # Optimization: general (reference: opts.py:67-92)
        max_epochs=-1,
        max_iterations=-1,  # TPU-native addition: hard iteration cap (-1 = off)
        batch_size=10,
        grad_clip=1.0,
        drop_prob_lm=0.0,
        drop_prob_reason=0.0,
        drop_prob_fusion=0.0,
        drop_prob_obj_att=0.0,
        drop_prob_connect=0.0,
        seq_per_img=5,
        beam_size=1,
        num_eval_no_improve=10,
        # Optimizer (reference: opts.py:94-128)
        optim="adam",
        optim_lr=5e-4,
        optim_rl_lr=5e-5,
        optim_rl_lr_ratio=2.0,
        load_lr=0,
        learning_rate_decay_start=1,
        learning_rate_decay_every=3,
        learning_rate_decay_rate=0.8,
        optim_adam_beta1=0.9,
        optim_adam_beta2=0.999,
        optim_epsilon=1e-8,
        optim_weight_decay=0.00001,
        optim_rmsprop_alpha=0.99,
        optim_momentum=0.0,
        optim_lr_decay=0.0,
        optim_rho=0.9,
        # PPO / RL (reference: opts.py:130-138)
        use_ppo=0,
        ppo_clip=0.2,
        ppo_k=10,
        entropy_reg=0.01,
        # Scheduled sampling (reference: opts.py:140-147)
        scheduled_sampling_start=-1,
        scheduled_sampling_increase_every=5,
        scheduled_sampling_increase_prob=0.05,
        scheduled_sampling_max_prob=0.25,
        # Evaluation / checkpointing (reference: opts.py:149-162)
        val_images_use=5000,
        save_checkpoint_every=5000,
        checkpoint_path="checkpoint",
        language_eval=1,
        losses_log_every=25,
        load_best_score=1,
        # misc (reference: opts.py:164-198)
        id="",
        load_model_id="",
        train_only=0,
        verbose=0,
        online_training=0,
        use_cuda=0,  # kept for surface parity; meaningless on TPU
        seed=100,
        maxout=0,
        review_maxout=0,
        fusion_maxout=0,
        async_opt=0,
        num_processes=4,
        use_baseline=1,
        bleu4_weight=0.0,
        cider_weight=1.0,
        spice_weight=0.0,
        # SPICE reward backend: 'approx' = in-repo pure-Python approximate
        # scorer (works standalone); 'http' = external spiceD-protocol
        # service at --ip/--port, the reference deployment (spiceD.py:30-114;
        # `rfnet-spice-server` implements it in-repo)
        spice_backend="approx",
        # self attention (declared-but-unused in reference, kept for parity:
        # opts.py:201-204)
        num_head=8,
        drop_prob_self_attn=0.1,
        # review net (reference: opts.py:206-218)
        num_review_steps=8,
        num_review_steps_0=8,
        reason_weight=1.0,
        guiding_weight=1.0,
        guiding_l1_penality=0.001,
        review_net_same_rnn=0,
        # eval (reference: opts.py:220-242)
        eval_split="test",
        eval_flip_ensemble=0,
        image_folder="",
        image_root="",
        model_path="",
        infos_path="",
        sample_max=1,
        print_beam_candidate=0,
        print_top_words=0,
        eval_ensemble_multi_gpu=0,
        eval_num_models_per_gpu=4,
        # SPICE reward service (used by reference get_rewards.py:88 but never
        # declared there — fixed by construction here)
        ip="localhost",
        port=8090,
        # TPU-native additions (not in reference)
        synthetic_features=0,  # use deterministic random features (smoke runs)
        backbone_weights="",  # torchvision state dict for --image_folder eval
        backbone_arch="resnet101",
        json_log="",  # JSONL event log path (utils/logging.py)
        data_root="data/features",
        num_dp_devices=1,  # data-parallel mesh size for pjit training
        num_mp_devices=1,  # tensor-parallel ('mp') mesh axis for XE
        # training: shards the vocab-dim logit/embed projections (the
        # largest matmuls) over mp on a dp x mp mesh (parallel/mesh.py
        # shard_params_2d). Optional at 512-dim scale (SURVEY §2.5) — dp
        # alone is the right default; >1 builds the 2-D mesh
        n_seeds=1,  # vmapped multi-seed fleet size (replaces the per-GPU
        # bash fleet of train_recurrent_fusion_model.sh; 1 = solo run)
        dtype="float32",  # compute dtype: float32 | bfloat16
        use_remat=0,  # rematerialize scan steps in backward (bigger batches)
        remat_policy="save_ctx",  # save_ctx | full: save_ctx keeps the tiny
        # per-step attention contexts/weights as backward residuals so the
        # remat recompute never re-reads the big (B, A, D) feature arrays a
        # third time; full is the save-nothing round-2 remat. Identical
        # numerics (models/base.py::remat_wrap)
        # Profile policy (round-3 decision, VERDICT r2 item 4): the
        # TPU-native profile is the default and enables architecture
        # variants that are measured-faster with proxy-equal quality;
        # --reference_parity 1 pins strict reference semantics instead.
        reference_parity=0,
        tied_att_keys=-1,  # RFNet variant: share attention-KEY projections
        # across review steps (8x fewer encode-key FLOPs; measured 1.53x
        # decode / 1.49-1.69x train at flagship dims, exact-sharing proof in
        # tests, quality chains pass — PERF_NOTES.md §5, PIPELINE_PROXY_TIED).
        # -1 = auto: ON in the TPU-native profile, OFF under
        # --reference_parity; explicit 0/1 always wins.
        low_rank_ctx=0,  # RFNet variant (OPT-IN, off = reference
        # semantics): per-encoder learned value projection to rnn_size,
        # applied once per sequence; stage-I attention contexts are
        # computed in that space. The per-step (B, A, D) value reads are
        # the measured bulk of train-step HBM traffic (PROFILE_TRAIN_r05),
        # so this cuts the memory-roofline-bound step's traffic ~3.6x on
        # the dominant term. Keys/scores still see the raw features.
        checkpoint_backend="pickle",  # 'pickle' (reference triple-file
        # contract) | 'orbax' (sharded, multi-host; training/orbax_ckpt.py)
        checkpoint_async=0,  # orbax only: background the disk write (the
        # device->host copy stays synchronous, so donation is safe)
        graceful_preempt=1,  # SIGTERM -> checkpoint at the next iteration
        # boundary and exit cleanly (training/preempt.py; multi-host runs
        # coordinate via a per-boundary flag all-gather, so a signal on any
        # subset of hosts stops every host at the same boundary)
        rl_resume=0,  # with --start_from: resume an SCST run from its own
        # rl_ checkpoints (rolling, optimizer + LR base restored) instead
        # of warm-starting from the XE best (the reference can only do the
        # latter — a crashed RL run loses all RL progress there)
        rl_overlap=1,  # SCST software pipeline: dispatch the next batch's
        # rollout behind the grad step and defer the loss readback, hiding
        # both dispatch round-trips (trajectory-identical to the serial
        # loop — train_rl_loop.py; 0 = serial, for A/B measurement)
        xe_overlap=1,  # XE twin of rl_overlap: dispatch step k+1 before
        # reading loss k, so the per-step loss readback never re-serializes
        # the device on the dispatch round-trip (train_loop.py)
        profile_dir="",  # capture a jax.profiler trace (xprof) into this dir
        profile_start=5,  # first iteration of the trace window
        profile_steps=0,  # number of iterations to trace (0 = off)
        # Runtime-derived (set by the data loader before model construction)
        vocab_size=None,
        seq_length=None,
        current_lr=None,
        ss_prob=0.0,
    )


def _add_all_flags(parser: argparse.ArgumentParser) -> None:
    for key, value in _defaults().items():
        if key in ("vocab_size", "seq_length", "current_lr", "feat_array_info"):
            continue
        if value is None:
            parser.add_argument(f"--{key}", type=str, default=None)
        elif isinstance(value, bool):
            parser.add_argument(f"--{key}", type=int, default=int(value))
        elif isinstance(value, int):
            parser.add_argument(f"--{key}", type=int, default=value)
        elif isinstance(value, float):
            parser.add_argument(f"--{key}", type=float, default=value)
        else:
            parser.add_argument(f"--{key}", type=str, default=value)


def validate_options(opt) -> None:
    """Post-parse validation (reference: opts.py:247-258)."""
    assert opt.rnn_size > 0, "rnn_size should be greater than 0"
    assert opt.num_layers > 0, "num_layers should be greater than 0"
    assert opt.input_encoding_size > 0, "input_encoding_size should be greater than 0"
    assert opt.batch_size > 0, "batch_size should be greater than 0"
    assert 0 <= opt.drop_prob_lm <= 1, "drop_prob_lm should be between 0 and 1"
    assert opt.seq_per_img > 0, "seq_per_img should be greater than 0"
    assert opt.beam_size > 0, "beam_size should be greater than 0"
    assert opt.save_checkpoint_every > 0, "save_checkpoint_every should be greater than 0"
    assert opt.losses_log_every > 0, "losses_log_every should be greater than 0"
    assert opt.language_eval in (0, 1), "language_eval should be 0 or 1"
    assert getattr(opt, "remat_policy", "save_ctx") in ("save_ctx", "full"), \
        "remat_policy should be 'save_ctx' or 'full'"
    assert opt.load_best_score in (0, 1), "load_best_score should be 0 or 1"
    assert opt.train_only in (0, 1), "train_only should be 0 or 1"


def _wire_features(opt) -> None:
    """Feature-path expansion from the registry (reference: opts.py:260-313)."""
    if getattr(opt, "feat_array_info", None):
        # Caller supplied an explicit encoder list (tests / synthetic data).
        return
    if opt.feature_type == "synthetic":
        # files-free smoke runs: small fabricated encoder dims (one encoder,
        # or M=3 heterogeneous ones for the fusion model)
        if opt.caption_model == "recurrent_fusion_model":
            opt.feat_array_info = [
                {"fc_feat_size": 64, "att_feat_size": 48, "att_num": 8},
                {"fc_feat_size": 48, "att_feat_size": 32, "att_num": 6},
                {"fc_feat_size": 56, "att_feat_size": 40, "att_num": 7},
            ]
        else:
            opt.feat_array_info = [
                {"fc_feat_size": 64, "att_feat_size": 48, "att_num": 8}
            ]
        return
    if opt.feature_type == "feat_array":
        opt.feat_array_info = feat_registry.feat_array_info(opt.data_root)
        return
    info = feat_registry.encoder_info(opt.feature_type, opt.data_root)
    # single-encoder runs carry their one EncoderInfo here: build_loader
    # resolves the feature backend from it and the model factories read
    # dims from feat_array_info[0] (an empty list made the default
    # --feature_type inception_v3 file-backed path unreachable)
    opt.feat_array_info = [info]
    opt.input_fc_dir = info["original"]["fc"]
    opt.input_att_dir = info["original"]["att"]
    for variant in feat_registry.VARIANTS:
        dirs = info.variant_dirs(variant)
        suffix = "" if variant == "original" else "_" + variant
        # Reference flag names: input_fc_flip_dir, input_att_crop_dir, ...
        # map crop_tr -> "crop" to match reference naming (opts.py:289-293).
        ref_suffix = suffix.replace("_crop_tr", "_crop")
        setattr(opt, f"input_fc{ref_suffix}_dir", dirs["fc"])
        setattr(opt, f"input_att{ref_suffix}_dir", dirs["att"])
    opt.fc_feat_size = info.fc_feat_size
    opt.att_feat_size = info.att_feat_size
    opt.att_num = info.att_num


def finalize_options(opt) -> None:
    validate_options(opt)
    _wire_features(opt)
    if not hasattr(opt, "feat_array_info"):
        opt.feat_array_info = []
    # profile resolution: tied_att_keys 'auto' follows the profile
    if getattr(opt, "tied_att_keys", 0) == -1:
        opt.tied_att_keys = 0 if getattr(opt, "reference_parity", 0) else 1


def enable_compile_cache():
    """Persistent XLA compile cache for every CLI entry point: the flagship
    graphs take minutes to compile on remote-compile TPU hosts, and repeated
    train/eval invocations must not pay that again. Honors JAX_CACHE_DIR;
    JAX_NO_COMPILE_CACHE=1 disables."""
    import os

    if os.environ.get("JAX_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE_DIR", "/tmp/rfnet_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never block a run on cache plumbing
        print(f"warning: compile cache unavailable: {e}")


def parse_opt(argv: Optional[Sequence[str]] = None) -> Options:
    """Parse CLI flags into an Options namespace (reference: opts.py:7-315)."""
    enable_compile_cache()
    parser = argparse.ArgumentParser(
        description="TPU-native RFNet captioning framework options"
    )
    _add_all_flags(parser)
    args = parser.parse_args(argv)
    opt = Options.__new__(Options)
    SimpleNamespace.__init__(opt, **vars(args))
    opt.vocab_size = None
    opt.seq_length = None
    opt.current_lr = None
    opt.ss_prob = 0.0
    finalize_options(opt)
    return opt


def model_dims(opt) -> dict:
    """Per-model dimension summary used by model constructors."""
    feats = opt.feat_array_info
    return dict(
        vocab_size=opt.vocab_size,
        seq_length=opt.seq_length,
        rnn_size=opt.rnn_size,
        input_encoding_size=opt.input_encoding_size,
        att_hid_size=opt.att_hid_size,
        num_feat_array=len(feats) if feats else 0,
        fc_feat_sizes=[f["fc_feat_size"] for f in feats] if feats else [],
        att_feat_sizes=[f["att_feat_size"] for f in feats] if feats else [],
        att_nums=[f["att_num"] for f in feats] if feats else [],
    )
