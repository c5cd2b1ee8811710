"""Metric-level parity vs the REFERENCE's own eval loops.

The oracle tests pin logit-level parity (tests/test_parity_gpt3 etc.);
this harness closes the remaining gap to the BASELINE.md north star
("Retrieval R@1 / cls top-1 parity") by executing the reference's OWN
eval functions — ``evaluation`` + ``cal_metric`` from
downstream/run_cls_distributed_gpt3.py:201,250, ``itm_eval`` from
downstream/run_retrieval_distributed_gpt3_itm.py:296, and the full
retrieval-ITM ``evaluation`` loop (:229-294, the chunked V×T
是-probability matrix build) — side by side with this repo's run_cls /
run_retrieval_itm eval paths on SHARED model outputs and SHARED
synthetic annotations, and asserting the metrics agree.

How the reference loop runs here (read-only import, nothing copied):

- the heavy reference imports (megatron model classes, dataset/optim
  factories, ruamel/sh/timm) are stubbed at sys.modules level — the
  eval functions under test never touch them;
- the reference's ``utils`` module (MetricLogger weighted aggregation —
  part of the metric semantics) is the REAL reference file;
- the model/tokenizer the reference loop calls are thin adapters around
  THIS repo's jitted ``MPLUGVideo.cls_eval_scores`` and BatchTokenizer,
  so both eval protocols consume identical model outputs — what's
  compared is the eval protocol itself: per-class prompt construction,
  scoring arrangement, top-k math, batch-weighted aggregation.

Tie-break note: ``torch.topk`` orders equal scores in impl-defined heap
order (neither index-stable nor argsort order), so top-k parity is
asserted on continuous logits — exact ties at the k boundary are
measure-zero for real model outputs and are NOT a contract either
implementation can promise.

Run: ``python tools/metric_parity.py`` -> one JSON line with both
frameworks' metrics and max divergence (also pinned by
tests/test_metric_parity.py).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types
from typing import Dict, List

import numpy as np

REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# reference module loading (read-only, heavy deps stubbed)
# ---------------------------------------------------------------------------

def _mk_module(name, **attrs):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.util.spec_from_loader(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _exec_reference_file(relpath: str, name: str):
    path = os.path.join(REFERENCE, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    code = compile(open(path).read(), path, "exec")
    exec(code, mod.__dict__)
    return mod


_REF_MODULES = None


def load_reference_eval_modules():
    """-> (ref_run_cls, ref_run_itm) with utils = the real reference
    utils module; raises ImportError if the reference tree is absent.
    Cached: the reference files execute once per process."""
    global _REF_MODULES
    if _REF_MODULES is not None:
        return _REF_MODULES
    if not os.path.isdir(os.path.join(REFERENCE, "downstream")):
        raise ImportError(f"reference tree not available at {REFERENCE}")
    import torch  # noqa: F401  (required by the reference files)

    def _noop(*a, **k):
        raise RuntimeError("stubbed reference factory called")

    stubs = {}
    ruamel = _mk_module("ruamel")
    ruamel_yaml = _mk_module("ruamel.yaml", YAML=_noop,
                             load=_noop, safe_load=_noop)
    ruamel.yaml = ruamel_yaml
    stubs["ruamel"] = ruamel
    stubs["ruamel.yaml"] = ruamel_yaml
    stubs["sh"] = _mk_module("sh")
    timm = _mk_module("timm")
    timm_utils = _mk_module("timm.utils", get_state_dict=_noop)
    timm.utils = timm_utils
    stubs["timm"] = timm
    stubs["timm.utils"] = timm_utils
    models_pkg = _mk_module("models")
    stubs["models"] = models_pkg
    stubs["models.distributed_gpt3"] = _mk_module(
        "models.distributed_gpt3", DistributedGPT3_Cls=_noop,
        DistributedGPT3_Retrieval_Cls=_noop)
    stubs["models.modeling_distributed_gpt3"] = _mk_module(
        "models.modeling_distributed_gpt3",
        DistributedGPT3Tokenizer=_noop)
    stubs["models.vision_transformer"] = _mk_module(
        "models.vision_transformer", resize_pos_embed=_noop,
        resize_temporal_embed=_noop)
    stubs["dataset"] = _mk_module(
        "dataset", create_dataset=_noop, create_sampler=_noop,
        create_loader=_noop)
    optim_pkg = _mk_module("optim", create_optimizer=_noop,
                           create_two_optimizer=_noop)
    stubs["optim"] = optim_pkg
    stubs["optim.optim_factory"] = _mk_module(
        "optim.optim_factory", get_parameter_groups=_noop)

    saved = {k: sys.modules.get(k) for k in
             list(stubs) + ["utils", "ref_utils", "ref_run_cls",
                            "ref_run_itm"]}
    try:
        sys.modules.update(stubs)
        ref_utils = _exec_reference_file("utils.py", "ref_utils")
        sys.modules["utils"] = ref_utils
        ref_run_cls = _exec_reference_file(
            "downstream/run_cls_distributed_gpt3.py", "ref_run_cls")
        ref_run_itm = _exec_reference_file(
            "downstream/run_retrieval_distributed_gpt3_itm.py",
            "ref_run_itm")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    _REF_MODULES = (ref_run_cls, ref_run_itm)
    return _REF_MODULES


# ---------------------------------------------------------------------------
# adapters: the reference eval loop drives THIS repo's model/tokenizer
# ---------------------------------------------------------------------------

class _TokenizerAdapter:
    """Our BatchTokenizer behind the HF-tokenizer call surface the
    reference evaluation uses (padding/truncation/max_length kwargs,
    .to(device) on the result)."""

    def __init__(self, batch_tokenizer):
        self._bt = batch_tokenizer

    def __call__(self, texts, padding=None, truncation=True,
                 max_length=None, return_tensors=None):
        if isinstance(texts, tuple):
            texts = list(texts)
        enc = self._bt(texts, padding="max_length",
                       **({"max_length": max_length} if max_length
                          else {}))

        class _Batch(dict):
            def to(self, device, **kw):
                return self

        return _Batch(enc)


class _ModelAdapter:
    """(video, text_input, prompt_text_input, train=False) ->
    (generation_logits, cls_logits) as torch tensors, computed by this
    repo's jitted MPLUGVideo.cls_eval_scores — the same function our own
    evaluation calls."""

    def __init__(self, score_fn, params, num_classes):
        self._score = score_fn
        self._params = params
        self._n = num_classes

    def eval(self):
        return self

    def __call__(self, video, text_input, prompt_text_input,
                 train=False):
        import torch

        out = self._score(
            self._params, video.numpy(),
            np.asarray(text_input["input_ids"]),
            np.asarray(text_input["attention_mask"]),
            np.asarray(text_input["prompt_lengths"]),
            np.asarray(prompt_text_input["input_ids"]),
            np.asarray(prompt_text_input["attention_mask"]))
        gen = torch.from_numpy(np.asarray(out["generation_logits"],
                                          np.float32))
        cls = out.get("cls_logits")
        if cls is not None:
            cls = torch.from_numpy(np.asarray(cls, np.float32))
        return gen, cls


class _RefLoaderAdapter:
    """The collated batches our evaluation consumed, re-served as the
    (video, text, labels) torch tuples + .dataset.idx2label the
    reference loop expects."""

    def __init__(self, raw_batches, classnames):
        self._batches = raw_batches
        self.dataset = types.SimpleNamespace(
            idx2label={i: c for i, c in enumerate(classnames)})

    def __len__(self):
        return len(self._batches)

    def __iter__(self):
        import torch

        for raw in self._batches:
            yield (torch.from_numpy(np.asarray(raw["video"])),
                   tuple(raw["text"]),
                   torch.from_numpy(np.asarray(raw["label"],
                                               np.int64)))


class ListLoader:
    """Pre-collated batches as a loader (uneven batch sizes exercise
    the weighted aggregation both frameworks must agree on)."""

    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


# ---------------------------------------------------------------------------
# harnesses
# ---------------------------------------------------------------------------

def make_cls_runner(tmp_dir: str, num_classes: int = 5, seed: int = 0):
    """Tiny MPLUGVideo cls runner on the 8-dev CPU mesh (the
    test_e2e_downstream geometry) + its jitted score fn."""
    import yaml

    import jax

    from youku_mplug_tpu.cli import common
    from youku_mplug_tpu.models.tasks import MPLUGVideo
    from youku_mplug_tpu.ops.preprocess import normalize_clip

    text_json = os.path.join(tmp_dir, "text.json")
    vision_json = os.path.join(tmp_dir, "vision.json")
    json.dump({"vocab_size": 128, "hidden_size": 32,
               "num_hidden_layers": 1, "num_attention_heads": 4,
               "max_position_embeddings": 128,
               "hidden_dropout_prob": 0.0,
               "attention_probs_dropout_prob": 0.0,
               "layernorm_epsilon": 1e-5}, open(text_json, "w"))
    json.dump({"img_size": 32, "patch_size": 16, "embed_dim": 32,
               "depth": 1, "num_heads": 2, "num_frames": 2,
               "mlp_ratio": 2}, open(vision_json, "w"))
    cfg = {
        "text_cfg": text_json, "visual_cfg": vision_json,
        "mesh": {"data": 4, "model": 2}, "batch_size": 4,
        "num_workers": 1, "max_length": 20, "num_frames": 2,
        "image_res": 32, "num_learnable_token": 4, "embed_dim": 8,
        "freeze_text_decoder": True, "use_cls": True,
        "num_classes": num_classes, "synthetic_length": 8,
        "optimizer": {"lr": 1e-3, "opt": "AdamW", "weight_decay": 0.01,
                      "clip_grad": 3.0},
        "schedular": {"epochs": 1, "min_lr": 1e-5, "warmup_steps": 1,
                      "lr_sched_type": "cosine"},
    }
    cfg_path = os.path.join(tmp_dir, "cls.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    args = common.base_parser("metric-parity").parse_args([
        "--config", cfg_path, "--output_dir",
        os.path.join(tmp_dir, "out"), "--fp32", "--synthetic_data",
        "--seed", str(seed)])
    runner = common.setup(args, niter_per_ep=1)

    num_cls = num_classes
    model = runner.model
    dtype = model.policy.compute_dtype

    @jax.jit
    def score(params, video, ids, mask, plens, pids, pmask):
        v = normalize_clip(video, dtype=dtype)
        return model.apply({"params": params}, v, ids, mask, plens,
                           prompt_ids=pids, prompt_mask=pmask,
                           num_cls=num_cls,
                           method=MPLUGVideo.cls_eval_scores)

    return runner, score


def synthetic_cls_batches(num_classes: int, sizes=(4, 4, 2),
                          num_frames=2, res=32, seed=0) -> List[dict]:
    rng = np.random.default_rng(seed)
    out = []
    i0 = 0
    for n in sizes:
        out.append({
            "video": rng.integers(0, 255, size=(n, num_frames, res, res,
                                                3), dtype=np.uint8),
            "text": [f"synthetic clip {i0 + j} title words"
                     for j in range(n)],
            "label": rng.integers(0, num_classes, size=(n,)).astype(
                np.int64),
        })
        i0 += n
    return out


def run_cls_parity(tmp_dir: str, seed: int = 0) -> Dict[str, dict]:
    """Our run_cls.evaluation vs the reference's evaluation()+cal_metric
    on shared weights, shared batches, shared model outputs."""
    import jax

    from youku_mplug_tpu.cli import run_cls

    ref_run_cls, _ = load_reference_eval_modules()

    num_classes = 8  # > 5 so top-5 isn't trivially 100%
    runner, score = make_cls_runner(tmp_dir, num_classes, seed)
    classnames = run_cls.load_classnames(runner.cfg)[:num_classes]
    batches = synthetic_cls_batches(num_classes, seed=seed)
    loader = ListLoader(batches)

    ours = run_cls.evaluation(runner, loader, classnames)

    import torch

    ref_run_cls.args = types.SimpleNamespace(
        max_length=runner.cfg.max_length)
    model = _ModelAdapter(
        lambda p, *a: _with_mesh(runner.mesh, score, p, *a),
        runner.params, num_classes)
    tok = _TokenizerAdapter(runner.tokenizer)
    ref_loader = _RefLoaderAdapter(batches, classnames)
    config = {"num_classes": num_classes, "use_cls": True}
    theirs_raw = ref_run_cls.evaluation(model, ref_loader, tok,
                                        torch.device("cpu"), config)
    theirs = {k: float(v) for k, v in theirs_raw.items()}
    return {"ours": {k: float(v) for k, v in ours.items()},
            "reference": theirs}


def _with_mesh(mesh, fn, *args):
    import jax

    with jax.set_mesh(mesh):
        return jax.device_get(fn(*args))


class _ItmLoaderAdapter:
    """Video batches re-served as the (video, vid_id) torch tuples +
    .dataset.{text,video} attributes the reference ITM evaluation loop
    expects."""

    def __init__(self, batches, texts, num_video):
        self._batches = batches
        self.dataset = types.SimpleNamespace(
            text=list(texts), video=list(range(num_video)))

    def __iter__(self):
        import torch

        for raw in self._batches:
            yield (torch.from_numpy(np.asarray(raw["video"])),
                   list(raw["index"]))


class _ItmModelAdapter:
    """(video, text_input, prompt_text_input, train=False) ->
    (generation_prob, cls_prob) torch tensors from this repo's jitted
    MPLUGVideo.itm_eval_scores (one jit per text-chunk size)."""

    def __init__(self, runner):
        import functools

        import jax

        from youku_mplug_tpu.models.tasks import MPLUGVideo
        from youku_mplug_tpu.ops.preprocess import normalize_clip

        model = runner.model
        dtype = model.policy.compute_dtype
        self._mesh = runner.mesh
        self._params = runner.params

        @functools.lru_cache(maxsize=None)
        def score_fn(chunk):
            @jax.jit
            def score(params, video, ids, mask, plens, pids, pmask):
                v = normalize_clip(video, dtype=dtype)
                return model.apply(
                    {"params": params}, v, ids, mask, plens,
                    prompt_ids=pids, prompt_mask=pmask, num_text=chunk,
                    method=MPLUGVideo.itm_eval_scores)
            return score

        self._score_fn = score_fn

    def eval(self):
        return self

    def __call__(self, video, text_input, prompt_text_input,
                 train=False):
        import jax
        import torch

        nv = video.shape[0]
        chunk = np.asarray(text_input["input_ids"]).shape[0] // nv
        with jax.set_mesh(self._mesh):
            out = jax.device_get(self._score_fn(chunk)(
                self._params, video.numpy(),
                np.asarray(text_input["input_ids"]),
                np.asarray(text_input["attention_mask"]),
                np.asarray(text_input["prompt_lengths"]),
                np.asarray(prompt_text_input["input_ids"]),
                np.asarray(prompt_text_input["attention_mask"])))
        gen = torch.from_numpy(np.asarray(out["generation_logits"],
                                          np.float32))
        cls = torch.from_numpy(np.asarray(out["cls_logits"], np.float32))
        return gen, cls


def run_itm_loop_parity(tmp_dir: str, seed: int = 0) -> Dict[str, dict]:
    """The reference's WHOLE retrieval-ITM evaluation (chunked V x T
    是-probability matrix build, run_retrieval_distributed_gpt3_itm.py
    :229-294) driven by this repo's model/tokenizer, its matrices fed to
    ITS OWN itm_eval — compared against run_retrieval_itm.evaluation on
    the same dataset and weights."""
    import torch

    from youku_mplug_tpu.cli import run_retrieval_itm
    from youku_mplug_tpu.data.datasets import SyntheticVideoDataset

    _, ref_run_itm = load_reference_eval_modules()
    runner, _ = make_cls_runner(tmp_dir, num_classes=2, seed=seed)

    n = 6
    ds = SyntheticVideoDataset(length=n, num_frames=2, size=32)
    ds.text = [f"synthetic clip {i}" for i in range(n)]
    ds.vid2txt = {i: [i] for i in range(n)}
    ds.txt2vid = {i: i for i in range(n)}

    ours = run_retrieval_itm.evaluation(runner, ds)

    # reference loop over the SAME video batches / texts / tokenizer
    batches = []
    for lo in range(0, n, 4):
        idx = list(range(lo, min(n, lo + 4)))
        batches.append({
            "video": np.stack([ds[i]["video"] for i in idx]),
            "index": idx})
    ref_run_itm.args = types.SimpleNamespace(
        max_length=runner.cfg.max_length, distributed=False)
    model = _ItmModelAdapter(runner)
    tok = _TokenizerAdapter(runner.tokenizer)
    loader = _ItmLoaderAdapter(batches, ds.text, n)
    gen_v2t, gen_t2v, cls_v2t, cls_t2v = ref_run_itm.evaluation(
        model, loader, tok, torch.device("cpu"), {})
    ref_gen = ref_run_itm.itm_eval(gen_v2t, gen_t2v, ds.txt2vid,
                                   ds.vid2txt)
    ref_cls = ref_run_itm.itm_eval(cls_v2t, cls_t2v, ds.txt2vid,
                                   ds.vid2txt)
    theirs = {**{f"gen_{k}": float(v) for k, v in ref_gen.items()},
              **{f"cls_{k}": float(v) for k, v in ref_cls.items()}}
    return {"ours": {k: float(v) for k, v in ours.items()},
            "reference": theirs}


def run_itm_parity(seed: int = 0) -> Dict[str, dict]:
    """Reference itm_eval vs evals.metrics.itm_eval on shared score
    matrices + shared multi-caption annotations."""
    from youku_mplug_tpu.evals.metrics import itm_eval as ours_itm

    _, ref_run_itm = load_reference_eval_modules()
    rng = np.random.default_rng(seed)
    n_vid, caps_per = 12, 3
    n_txt = n_vid * caps_per
    img2txt = {i: list(range(i * caps_per, (i + 1) * caps_per))
               for i in range(n_vid)}
    txt2img = {j: j // caps_per for j in range(n_txt)}
    scores_i2t = rng.standard_normal((n_vid, n_txt)).astype(np.float32)
    # give the diagonal block a bump so metrics aren't all-zero noise
    for i in range(n_vid):
        scores_i2t[i, img2txt[i][0]] += 1.5
    scores_t2i = scores_i2t.T.copy()

    theirs = ref_run_itm.itm_eval(scores_i2t, scores_t2i, txt2img,
                                  img2txt)
    ours = ours_itm(scores_i2t, scores_t2i, txt2img, img2txt)
    return {"ours": {k: float(v) for k, v in ours.items()},
            "reference": {k: float(v) for k, v in theirs.items()}}


def run_topk_parity(seed: int = 0) -> Dict[str, dict]:
    """Reference cal_metric vs evals.metrics.topk_accuracy on shared
    continuous logits (45-way, the production class count)."""
    import torch

    from youku_mplug_tpu.evals.metrics import topk_accuracy

    ref_run_cls, _ = load_reference_eval_modules()
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((64, 45)).astype(np.float32)
    labels = rng.integers(0, 45, size=(64,))
    t1, t5 = ref_run_cls.cal_metric(torch.from_numpy(logits),
                                    torch.from_numpy(labels),
                                    topk=(1, 5))
    o1, o5 = topk_accuracy(logits, labels, topk=(1, 5))
    return {"ours": {"top1": float(o1), "top5": float(o5)},
            "reference": {"top1": float(t1), "top5": float(t5)}}


def max_divergence(pair: Dict[str, dict]) -> float:
    keys = set(pair["ours"]) & set(pair["reference"])
    return max(abs(pair["ours"][k] - pair["reference"][k])
               for k in keys) if keys else float("nan")


def main():
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cls = run_cls_parity(d)
    with tempfile.TemporaryDirectory() as d:
        itm_loop = run_itm_loop_parity(d)
    itm = run_itm_parity()
    topk = run_topk_parity()
    report = {
        "cls": cls, "itm": itm, "itm_loop": itm_loop, "topk": topk,
        "max_divergence": {"cls": max_divergence(cls),
                           "itm": max_divergence(itm),
                           "itm_loop": max_divergence(itm_loop),
                           "topk": max_divergence(topk)},
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
