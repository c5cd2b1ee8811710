"""Test harness: 8 virtual CPU devices so multi-chip sharding semantics are
exercised without TPU hardware (the analog of the reference's TP=1
single-process degraded mode, scripts/run_cls_gpt3_1.3b.sh:14-16 — except we
test the *real* multi-device path).

The environment may pre-register a remote-TPU PJRT plugin at interpreter
start (sitecustomize) and force it via jax.config; tests must run locally on
CPU, so we flip the platform selection back before any backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend())
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# slow partition: tests measured >=10 s on one CPU (pytest --durations,
# 2026-08-19 full-suite run — 306 tests, 30:47 total).  The fast gate is
#   python -m pytest tests/ -q -m "not slow"     (< 2 min)
# and the full suite stays the pre-commit bar.  Whole modules are listed
# where a module-scoped fixture dominates the cost.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_e2e_downstream", "test_e2e_pretrain", "test_serving",
    "test_tasks", "test_multihost", "test_speculative",
    "test_accuracy_smoke", "test_bert_mplug",
    "test_lora", "test_bloom", "test_generation", "test_metric_parity",
}
_SLOW_TESTS = {
    "test_batched_greedy_matches_unpadded_oracle",
    "test_int8_quantized_decoder_matches_fp",
    "test_flash_attention_packed_subhead_strips",
    "test_flash_attention_nopad_path",
    "test_flash_attention_packed_multi_ref",
    "test_flash_attention_packed_matches_reference",
    "test_attention_dropout_is_applied",
    "test_vision_attention_dropout_is_applied",
    "test_decode_matches_full_forward",
    "test_remat_policies_same_loss_and_grad",
    "test_scan_matches_unrolled",
    "test_videoformer_shapes_and_inflate",
    "test_vision_import_from_reference_timesformer",
    "test_vision_lora_identity_and_freeze",
    "test_lora_decode_matches_full_forward",
    "test_merge_lora_matches_adapter_forward",
    "test_generate_front_padding_invariance",
    "test_prefill_decode_matches_forward",
    "test_flash_alibi_matches_xla_interpret",
    "test_top2_combines_two_experts",
    "test_pairing_grads_match",
    "test_pairing_decode_matches",
    "test_instruct_loss_and_grads",
    "test_generate_instruct_e2e",
    "test_run_instruct_cli_smoke",
    "test_instruct_finetune_e2e",
    "test_finetune_from_external_checkpoint",
    "test_mplug_pretrain_and_heads",
    "test_gpt2_coca",
    "test_prefix_decoder_parity",
    # second tier (5-18 s, measured on the "not slow" remainder)
    "test_flagship_geometry_bf16",
    "test_gpt3_import_twin_layout",
    "test_pairing_logits_match",
    "test_pairing_param_shapes",
    "test_top1_routing_equals_argmax_expert",
    "test_moe_expert_sharded_matches_replicated",
    "test_flash_attention_packed_period",
    "test_timesformer_parity",
    "test_clip_parity",
    "test_eva_vit_g_preset_shapes",
    "test_gpipe_transformer_stage_with_data_axis",
    "test_loss_masking_semantics",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[")[0]
        if mod in _SLOW_MODULES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
