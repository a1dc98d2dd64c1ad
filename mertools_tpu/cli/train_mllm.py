"""AffectGPT-equivalent training CLI (``MER2025_Track23/train.py``).

    python -m mertools_tpu.cli.train_mllm --config=train_config.yaml \
        [--options run.max_epoch=2 model.lora_r=16 ...]

YAML config sections mirror the reference's model_cfg/datasets_cfg/run_cfg
(OmegaConf + dotted --options overrides, common/config.py):

    model:
      llm_checkpoint: /path/to/qwen   # HF causal LM (or 'tiny' for smoke)
      lora_r: 16
      video_dim: 768
      audio_dim: 1024
      video_queries: 32
      audio_queries: 8
    datasets:
      openset_csv: ...
      reason_csv: ...
      subtitle_csv: ...
      video_feat_dir: ...
      audio_feat_dir: ...
      label_type: mixed
    run:
      max_epoch: 10
      iters_per_epoch: 100
      batch_size: 4
      init_lr: 1e-4
      output_dir: ./mllm_output

Training runs on the (data x model) mesh: batch sharded over ``data``,
tensor-parallel LLM over ``model`` when --n_model > 1.
"""

from __future__ import annotations

import argparse
import os


def apply_options(cfg: dict, options: list[str]) -> dict:
    for opt in options or []:
        key, val = opt.split("=", 1)
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        try:
            import ast

            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        node[parts[-1]] = val
    return cfg


def build_model(mcfg: dict, amp: str | None = None):
    import jax

    from ..mllm import AffectGPT, AffectGPTConfig, LLMConfig, QFormerConfig

    remat = bool(mcfg.get("remat", False))
    if mcfg.get("llm_checkpoint", "tiny") == "tiny":
        llm_cfg = LLMConfig.tiny(vocab=int(mcfg.get("vocab_size", 256)),
                                 lora_r=int(mcfg.get("lora_r", 4)))
        llm_params = None
        tokenizer = None
    else:
        from transformers import AutoModelForCausalLM, AutoTokenizer

        from ..mllm.llm import convert_torch_state

        hf = AutoModelForCausalLM.from_pretrained(mcfg["llm_checkpoint"])
        llm_cfg = LLMConfig.from_hf(hf.config,
                                    lora_r=int(mcfg.get("lora_r", 16)))
        llm_params = convert_torch_state(llm_cfg, hf.state_dict())
        tokenizer = AutoTokenizer.from_pretrained(mcfg["llm_checkpoint"])
        del hf

    if remat:
        import dataclasses

        # yaml `remat_policy: dots` (round 5) saves matmul outputs and
        # recomputes only elementwise ops; with `loss_chunk` set, `remat:
        # false` is the fastest fitting config at the 1.1B bench shapes
        # (MFU 0.596 vs 0.555 dots vs 0.396 full — BENCH_NUMBERS.md)
        llm_cfg = dataclasses.replace(
            llm_cfg, remat=True,
            remat_policy=str(mcfg.get("remat_policy", "full")))
    if mcfg.get("seq_parallel"):
        import dataclasses

        # production sp (--n_seq): LLM attention routes through the masked
        # causal ring over the mesh 'seq' axis (parallel/sp)
        llm_cfg = dataclasses.replace(llm_cfg, seq_axis="seq")
    # reference YAML key aliases (train_configs/*.yaml:16-19,55):
    # *_fusion_type, num_*_query_token, face_or_frame
    alias = lambda *keys, default=None: next(
        (mcfg[k] for k in keys if mcfg.get(k) is not None), default)
    face_or_frame = mcfg.get("face_or_frame")
    multi_fusion = alias("multi_fusion_type", "multi_fusion",
                         default="qformer")
    multi = mcfg.get("multi_queries")
    from ..mllm.affectgpt import SEGMENTS_BY_MODE

    has_multi = multi or (face_or_frame and
                          "multi" in SEGMENTS_BY_MODE[face_or_frame])
    cfg = AffectGPTConfig(
        llm=llm_cfg,
        video_qformer=QFormerConfig(
            num_queries=int(mcfg.get("video_queries", 32))),
        audio_qformer=QFormerConfig(
            num_queries=int(mcfg.get("audio_queries", 8))),
        multi_qformer=(QFormerConfig(num_queries=int(multi or 32))
                       if has_multi and multi_fusion == "qformer" else None),
        video_dim=int(mcfg.get("video_dim", 768)),
        audio_dim=int(mcfg.get("audio_dim", 1024)),
        image_dim=(int(mcfg["image_dim"]) if mcfg.get("image_dim")
                   else None),
        max_video_frames=int(mcfg.get("max_video_frames", 64)),
        max_audio_frames=int(mcfg.get("max_audio_frames", 64)),
        fusion=mcfg.get("fusion", "qformer"),
        video_fusion=alias("video_fusion_type", "video_fusion"),
        audio_fusion=alias("audio_fusion_type", "audio_fusion"),
        multi_fusion=multi_fusion,
        image_fusion=alias("image_fusion_type", "image_fusion",
                           default="mean"),
        num_video_query_token=int(mcfg.get("num_video_query_token", 1)),
        num_audio_query_token=int(mcfg.get("num_audio_query_token", 1)),
        num_multi_query_token=int(mcfg.get("num_multi_query_token", 1)),
        num_image_query_token=int(mcfg.get("num_image_query_token", 1)),
        face_or_frame=face_or_frame,
        # round 5: yaml `loss_chunk: N` (or --options model.loss_chunk=N)
        # trains with the sequence-chunked LM loss — no (B, S, V) logits
        loss_chunk=int(mcfg.get("loss_chunk", 0)))
    if amp == "bf16":   # bf16 AMP: DEFAULT-precision matmuls (see Runner)
        return (AffectGPT(cfg, precision=jax.lax.Precision.DEFAULT),
                llm_params, tokenizer)
    return AffectGPT(cfg), llm_params, tokenizer


def main(argv=None):
    from ..core.cache import enable_persistent_cache
    enable_persistent_cache()

    p = argparse.ArgumentParser("train_mllm")
    p.add_argument("--config", required=True)
    p.add_argument("--options", nargs="*", default=[])
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel width over the mesh 'model' axis")
    p.add_argument("--n_seq", type=int, default=1,
                   help="sequence-parallel width over a 'seq' mesh axis: "
                        "LLM attention runs the masked causal ring "
                        "(parallel/sp; O(S/n) attention memory per chip). "
                        "Composes with dp; sequence length must divide it")
    p.add_argument("--n_pipe", type=int, default=1,
                   help="pipeline-parallel stages over the mesh 'pipe' axis "
                        "(GPipe schedule; LLM layers split into equal "
                        "stages, one per device group). Composes with "
                        "--n_model (pp x tp x dp: stage kernels also shard "
                        "over 'model').")
    p.add_argument("--n_micro", type=int, default=0,
                   help="pipeline microbatches (0 = n_pipe); batch_size must "
                        "divide evenly")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from ..core.config import load_yaml
    from ..core.mesh import make_mesh
    from ..mllm.data import CaptionDataset, batch_iterator
    from ..mllm.runner import Runner, RunnerConfig, save_model

    cfg = apply_options(load_yaml(args.config), args.options)
    mcfg, dcfg, rcfg = cfg["model"], cfg["datasets"], cfg.get("run", {})

    # the reference carries face_or_frame in the datasets section
    # (train_configs/...face_lz.yaml:55); honor either placement
    if dcfg.get("face_or_frame") and not mcfg.get("face_or_frame"):
        mcfg["face_or_frame"] = dcfg["face_or_frame"]

    # --- raw-media mode (reference: datasets read raw faces/audio through
    # AlproVideoTrainProcessor and encode with frozen encoders each step —
    # mercaptionplus_dataset.py:25-105, video_processor.py:29-68) ----------
    raw_mode = bool(dcfg.get("face_dir")) and bool(dcfg.get("audio_dir"))
    venc = aenc = None
    if raw_mode:
        from ..mllm.encoders import (build_acoustic_encoder,
                                     build_visual_encoder)

        rand = bool(dcfg.get("random_init_encoders", False))
        venc, vdim = build_visual_encoder(
            dcfg.get("visual_encoder", "CLIP_VIT_LARGE"),
            dcfg.get("visual_ckpt"), random_init=rand)
        aenc, adim = build_acoustic_encoder(
            dcfg.get("acoustic_encoder", "HUBERT_LARGE"),
            dcfg.get("acoustic_ckpt"), random_init=rand)
        mcfg.setdefault("video_dim", vdim)
        mcfg.setdefault("audio_dim", adim)
        print(f"raw-media training: visual={dcfg.get('visual_encoder', 'CLIP_VIT_LARGE')} "
              f"(D={vdim}) acoustic={dcfg.get('acoustic_encoder', 'HUBERT_LARGE')} "
              f"(D={adim}) augment={dcfg.get('augment', True)}")

    amp = rcfg.get("amp")
    # decide sp viability BEFORE building the model: LLMConfig.seq_axis
    # without a 'seq' mesh would fail at trace time with a misleading
    # ambient-mesh assert (review finding, round 4)
    n_seq = getattr(args, "n_seq", 1)
    if n_seq > 1:
        assert args.n_model == 1 and args.n_pipe == 1, \
            "--n_seq composes with dp only (no tp/pp)"
        _bs = int(rcfg.get("batch_size", 4))
        _nd = jax.device_count() // n_seq
        if jax.device_count() > 1 and _nd >= 1 and _bs % max(_nd, 1) == 0:
            mcfg["seq_parallel"] = True
        else:
            print(f"--n_seq {n_seq}: not runnable with "
                  f"{jax.device_count()} devices / batch_size {_bs}; "
                  "running without sequence parallelism")
            n_seq = 1
    args.n_seq = n_seq
    model, llm_params, tokenizer = build_model(mcfg, amp)
    if tokenizer is None:
        from ..mllm.data import FakeWordTokenizer

        tokenizer = FakeWordTokenizer(model.cfg.llm.vocab_size)

    stream_dirs = {s: dcfg[f"{s}_feat_dir"]
                   for s in ("face", "frame", "audio", "image")
                   if dcfg.get(f"{s}_feat_dir")}
    dataset = CaptionDataset.from_csvs(
        dcfg["openset_csv"], dcfg.get("reason_csv"), dcfg.get("subtitle_csv"),
        dcfg.get("video_feat_dir"), dcfg.get("audio_feat_dir"),
        label_type=dcfg.get("label_type", "description"),
        face_or_frame=model.cfg.face_or_frame, stream_dirs=stream_dirs)
    print(f"dataset: {len(dataset)} annotated clips")

    # --- validation split (reference valid_splits, runner_base.py:318-324:
    # when configured, per-epoch eval drives best-checkpoint selection;
    # otherwise "best" is the last epoch / lowest train loss) -------------
    import dataclasses as _dc

    valid_frac = float(rcfg.get("valid_frac", 0.0))
    val_dataset = None
    if dcfg.get("valid_openset_csv"):
        val_dataset = CaptionDataset.from_csvs(
            dcfg["valid_openset_csv"], dcfg.get("valid_reason_csv"),
            dcfg.get("subtitle_csv"), dcfg.get("video_feat_dir"),
            dcfg.get("audio_feat_dir"),
            label_type=dcfg.get("label_type", "description"),
            face_or_frame=model.cfg.face_or_frame, stream_dirs=stream_dirs)
    elif valid_frac > 0 and len(dataset) >= 4:
        rng_split = np.random.default_rng(int(rcfg.get("seed", 42)))
        idx = rng_split.permutation(len(dataset.annotations))
        n_val = max(1, int(len(idx) * valid_frac))
        val_dataset = _dc.replace(
            dataset, annotations=[dataset.annotations[i]
                                  for i in idx[:n_val]])
        dataset = _dc.replace(
            dataset, annotations=[dataset.annotations[i]
                                  for i in idx[n_val:]])
        print(f"valid split: {n_val} val / {len(dataset)} train clips")

    from ..mllm.affectgpt import frozen_components

    frozen = frozen_components(mcfg)
    if frozen:
        print(f"freeze: {', '.join(frozen)}")
    run_cfg = RunnerConfig(
        frozen=frozen,
        max_epoch=int(rcfg.get("max_epoch", 10)),
        iters_per_epoch=int(rcfg.get("iters_per_epoch", 100)),
        batch_size=int(rcfg.get("batch_size", 4)),
        accum_grad_iters=int(rcfg.get("accum_grad_iters", 1)),
        init_lr=float(rcfg.get("init_lr", 1e-4)),
        min_lr=float(rcfg.get("min_lr", 8e-5)),
        warmup_steps=int(rcfg.get("warmup_steps", 100)),
        output_dir=rcfg.get("output_dir", "./mllm_output"),
        compute_dtype=("bf16" if amp == "bf16" else None),
        n_micro=args.n_micro)

    if raw_mode:
        from ..mllm.raw_train import raw_batch_iterator

        assert model.cfg.face_or_frame is None, \
            "raw-media mode drives the audio+video path (face_or_frame unset)"
        it = raw_batch_iterator(
            dataset, tokenizer, model.num_av_tokens, run_cfg.batch_size,
            face_dir=dcfg["face_dir"], audio_dir=dcfg["audio_dir"],
            visual_encode=venc, acoustic_encode=aenc,
            n_frms=int(dcfg.get("n_frms", 8)),
            augment=bool(dcfg.get("augment", True)),
            seed=int(rcfg.get("seed", 42)),
            max_len=int(rcfg.get("max_len", 512)))
    elif model.cfg.face_or_frame is not None:
        from ..mllm.data import stream_batch_iterator

        it = stream_batch_iterator(dataset, tokenizer, model.cfg,
                                   run_cfg.batch_size,
                                   seed=int(rcfg.get("seed", 42)),
                                   max_len=int(rcfg.get("max_len", 512)))
    else:
        it = batch_iterator(dataset, tokenizer, model.num_av_tokens,
                            run_cfg.batch_size,
                            seed=int(rcfg.get("seed", 42)),
                            max_len=int(rcfg.get("max_len", 512)))
    val_batches = []
    if raw_mode and val_dataset is not None and len(val_dataset) > 0:
        from ..mllm.raw_train import build_raw_val_batches

        val_batches = build_raw_val_batches(
            val_dataset, tokenizer, model.num_av_tokens, run_cfg.batch_size,
            face_dir=dcfg["face_dir"], audio_dir=dcfg["audio_dir"],
            visual_encode=venc, acoustic_encode=aenc,
            n_frms=int(dcfg.get("n_frms", 8)),
            max_len=int(rcfg.get("max_len", 512)))
    elif val_dataset is not None and len(val_dataset) > 0:
        from ..mllm.data import (_pad_seq_to_multiple, build_batch,
                                 build_stream_batch)

        vrng = np.random.default_rng(0)
        vbs, vml = run_cfg.batch_size, int(rcfg.get("max_len", 512))
        spans = [list(range(i, min(i + vbs, len(val_dataset))))
                 for i in range(0, len(val_dataset), vbs)]
        if len(spans) > 1 and len(spans[-1]) < vbs:
            spans = spans[:-1]  # full batches only: one eval compile
        for span in spans:
            samples = [val_dataset.sample(j, vrng) for j in span]
            if model.cfg.face_or_frame is not None:
                b = build_stream_batch(samples, tokenizer, model.cfg, vml)
            else:
                b = build_batch(samples, tokenizer, model.num_av_tokens, vml)
            val_batches.append(_pad_seq_to_multiple(b, 32, vml))

    n_seq = getattr(args, "n_seq", 1)
    n_data = jax.device_count() // (args.n_model * args.n_pipe * n_seq)
    mesh = None
    if jax.device_count() > 1 and run_cfg.batch_size % max(n_data, 1) == 0:
        if args.n_pipe > 1:
            from ..parallel.pp import make_pipe_mesh

            L = model.cfg.llm.num_layers
            assert L % args.n_pipe == 0, \
                f"num_layers {L} not divisible by --n_pipe {args.n_pipe}"
            assert run_cfg.batch_size % (run_cfg.n_micro or args.n_pipe) == 0
            mesh = make_pipe_mesh(args.n_pipe, n_data=n_data,
                                  n_model=args.n_model)
        elif n_seq > 1:
            from ..parallel.sp import make_dp_sp_mesh

            assert args.n_model == 1 and args.n_pipe == 1, \
                "--n_seq composes with dp only (no tp/pp)"
            mesh = make_dp_sp_mesh(n_seq, n_data=n_data)
        else:
            mesh = make_mesh(n_model=args.n_model)
    elif jax.device_count() > 1:
        print(f"batch_size {run_cfg.batch_size} not divisible by data axis "
              f"{n_data}; running single-device")

    batch0 = next(it)
    if n_seq > 1 and mesh is not None:
        # init traces the full forward (incl. the ring): pad the trace
        # batch to the 'seq' multiple and bind the mesh for the trace
        from ..mllm.runner import _pad_batch_seq
        from ..parallel import sp as _sp

        batch0 = _pad_batch_seq(batch0, n_seq)
        _sp.set_ambient_mesh(mesh)
    try:
        params = model.init(jax.random.PRNGKey(int(rcfg.get("seed", 42))),
                            batch0)["params"]
    finally:
        if n_seq > 1 and mesh is not None:
            _sp.set_ambient_mesh(None)
    if llm_params is not None:
        # path-based overlay: converted HF weights replace the init values;
        # leaves absent from the checkpoint (LoRA a/b) keep their init
        def overlay(cur, new):
            out = dict(cur)
            for k, v in new.items():
                out[k] = overlay(cur[k], v) if isinstance(v, dict) else v
            return out

        params = dict(params)
        params["llm"] = overlay(params["llm"], llm_params)
    runner = Runner(run_cfg, model, params, mesh=mesh)
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from jax.sharding import PartitionSpec as P

        n_sharded = sum(
            1 for leaf in jax.tree_util.tree_leaves(runner.state.params)
            if getattr(getattr(leaf, "sharding", None), "spec", P()) != P())
        assert n_sharded > 0, "--n_model > 1 but no param leaf is sharded"
        print(f"tensor parallel: {n_sharded} param leaves sharded over the "
              f"'model' axis (n_model={args.n_model}, n_data={n_data})")
    if mesh is not None and mesh.shape.get("pipe", 1) > 1:
        from jax.sharding import PartitionSpec as P

        leaf = runner.state.params["llm"]["stacked"]["q_proj"]["kernel"]
        assert leaf.sharding.spec[0] == "pipe", leaf.sharding
        print(f"pipeline parallel: LLM stages sharded over the 'pipe' axis "
              f"(n_pipe={args.n_pipe}, n_data={n_data}, "
              f"n_micro={run_cfg.n_micro or args.n_pipe})")
    os.makedirs(run_cfg.output_dir, exist_ok=True)

    start_epoch = 0
    resume = rcfg.get("resume_ckpt_path")
    if resume:  # reference resume semantics (runner_base.py:353-356,385-387)
        loaded_epoch = runner.load_checkpoint(resume)
        start_epoch = int(loaded_epoch or 0) + 1
        print(f"resumed from {resume} (epoch {loaded_epoch})")

    from ..core.profiling import trace

    best = float("inf")
    with trace():  # active when MERTPU_TRACE_DIR is set (SURVEY.md §5)
        for epoch in range(start_epoch, run_cfg.max_epoch):
            stats = runner.train_epoch(epoch, it)
            if val_batches:
                # reference: valid_splits eval drives best-checkpoint
                # selection (runner_base.py:401-435)
                stats["val_loss"] = runner.evaluate(val_batches)
            print(f"epoch {epoch}: {stats}")
            runner.save_checkpoint(epoch)
            crit = stats.get("val_loss", stats["train_loss"])
            if crit < best:
                best = crit
                runner.save_checkpoint(epoch, is_best=True)
    save_model(os.path.join(run_cfg.output_dir, "model"), model,
               runner._flat_params())
    print(f"done; best {'val' if val_batches else 'train'} loss "
          f"{best:.4f}; model saved to "
          f"{run_cfg.output_dir}/model")


if __name__ == "__main__":
    main()
