"""Per-component on-device timing + FLOPs of the flagship forward pass.

Each component is looped ITERS times inside one jitted fori_loop so the
host<->device (axon tunnel) latency is amortized out of the measurement.

Usage: python -u tools/profile_parts.py [part ...]
  parts: full encoder fgmsa fgmsa_nope trajnet decoder enc_embed enc_flow
         enc_stage0 enc_stage1 enc_stage2  (default: the five coarse parts)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import dataclasses
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from strajnet_tpu.config import STRAJNET_CONFIG

# Profile the bench configuration: fused Pallas window attention on.
cfg = dataclasses.replace(STRAJNET_CONFIG, use_pallas_attention=True)
from strajnet_tpu.models.strajnet import STrajNet, dummy_inputs
from strajnet_tpu.models.swin import SwinTransformerEncoder
from strajnet_tpu.models.trajnet import TrajNetCrossAttention
from strajnet_tpu.models.decoder import Pyramid3DDecoder
from strajnet_tpu.models.fgmsa import FGMSA

B = int(os.environ.get("PROFILE_BATCH", "16"))
ITERS = int(os.environ.get("PROFILE_ITERS", "20"))
dt = jnp.bfloat16

_KNOWN_PARTS = {"full", "encoder", "fgmsa", "fgmsa_nope", "trajnet",
                "decoder", "enc_embed", "enc_flow", "enc_stage0",
                "enc_stage1", "enc_stage2", "dec_up3", "dec_up2", "dec_up1",
                "dec_tail_occ", "dec_upf1", "dec_tail_flow", "dec_res"}
PARTS = set(sys.argv[1:]) or {"full", "encoder", "fgmsa", "trajnet",
                              "decoder"}
_unknown = PARTS - _KNOWN_PARTS
if _unknown:  # fail fast, before minutes of model init / compile
    sys.exit(f"unknown part(s): {sorted(_unknown)}; "
             f"choose from {sorted(_KNOWN_PARTS)}")


def device_time(name, fn, params, inputs, probe_key):
    """fn(params, inputs_dict) -> pytree; loops on device, returns ms/iter.

    Also prints the part's compiled-program cost analysis (flops, bytes
    accessed) and the achieved TFLOP/s / GB/s vs the v5e peaks — the
    roofline attribution (PARITY.md)."""
    if name not in PARTS:
        return None

    @jax.jit
    def loop(params, inputs):
        def body(_, carry):
            probed = dict(inputs)
            probed[probe_key] = probed[probe_key] + carry.astype(
                probed[probe_key].dtype) * 1e-30
            out = fn(params, probed)
            return jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    flops = bytes_ = 0.0
    try:
        ca = jax.jit(fn).lower(params, inputs).compile().cost_analysis()
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass

    float(loop(params, inputs))  # compile + warmup
    t0 = time.perf_counter()
    float(loop(params, inputs))
    ms = (time.perf_counter() - t0) / ITERS * 1000
    line = (f"{name:12s}: {ms:8.2f} ms/batch{B}  "
            f"({B / ms * 1000:7.1f} scenes/s)")
    if flops:
        tflops = flops / ms / 1e9     # flops / (ms*1e-3) / 1e12
        gbs = bytes_ / ms / 1e6       # bytes / (ms*1e-3) / 1e9
        line += (f"  {flops/1e9:7.1f} GF {bytes_/1e9:6.2f} GB"
                 f"  -> {tflops:6.1f} TF/s ({tflops/197*100:4.1f}% MXU)"
                 f" {gbs:6.0f} GB/s ({gbs/819*100:4.1f}% HBM)")
    print(line, flush=True)
    return ms


model = STrajNet(cfg=cfg)
inputs = dummy_inputs(cfg, batch=B)
# jitted one-program init via the kernels-off twin (eager init through the
# remote tunnel is RTT-bound at ~8 min — BASELINE.md "Bench wall anatomy")
_init_model = STrajNet(cfg=dataclasses.replace(cfg,
                                               use_pallas_attention=False))
params = jax.jit(lambda r, kw: _init_model.init(r, **kw))(
    jax.random.PRNGKey(0), dummy_inputs(cfg, batch=1))

fwd = jax.jit(lambda p, kw: model.apply(p, **kw))
ca = fwd.lower(params, inputs).compile().cost_analysis()
if ca:
    print(f"total flops/batch: {ca.get('flops', 0)/1e9:.1f} G "
          f"({ca.get('flops', 0)/B/1e9:.2f} G/scene); "
          f"bytes accessed: {ca.get('bytes accessed', 0)/1e9:.2f} GB")

total = device_time("full", lambda p, kw: model.apply(p, **kw), params,
                    inputs, "flow")

enc = SwinTransformerEncoder(
    img_size=cfg.input_size, embed_dim=cfg.embed_dim, depths=cfg.depths,
    num_heads=cfg.num_heads, window_size=cfg.window_size, large_input=True,
    use_pallas=cfg.use_pallas_attention, dtype=dt)
ep = {"params": params["params"]["encoder"]}
device_time("encoder",
            lambda p, kw: enc.apply(p, kw["ogm"], kw["map_img"], kw["flow"]),
            ep, inputs, "flow")

fg = FGMSA(q_size=(16, 16), kv_size=(16, 16), n_heads=8, n_head_channels=48,
           n_groups=8, out_dim=384, in_dim=384, fg=True, dtype=dt)
fgp = {"params": params["params"]["fg_msa_layer"]}
fg_in = {"x": jnp.zeros((B, 16, 16, 384), dt)}
device_time("fgmsa", lambda p, kw: fg.apply(p, kw["x"]), fgp, fg_in, "x")

# Attribution variant: use_pe=False drops the rpe-bias window sampling, so
# (fgmsa - fgmsa_nope) isolates the rpe cost inside the fused program.
fg_nope = FGMSA(q_size=(16, 16), kv_size=(16, 16), n_heads=8,
                n_head_channels=48, n_groups=8, out_dim=384, in_dim=384,
                fg=True, use_pe=False, dtype=dt)
device_time("fgmsa_nope", lambda p, kw: fg_nope.apply(p, kw["x"]), fgp,
            fg_in, "x")

tn = TrajNetCrossAttention(pic_size=(16, 16), pic_dim=384, dtype=dt)
tnp_ = {"params": params["params"]["trajnet_attn"]}
tn_in = {"q": jnp.zeros((B, 8, 256, 384), dt), "obs": inputs["obs"],
         "occ": inputs["occ"], "mapt": inputs["mapt"]}
device_time("trajnet",
            lambda p, kw: tn.apply(p, kw["q"], kw["obs"], kw["occ"],
                                   kw["mapt"]),
            tnp_, tn_in, "q")

res_shapes = [(B, 64 * 64, 96), (B, 64 * 64, 96), (B, 32 * 32, 192),
              (B, 16 * 16, 384)]
dec = Pyramid3DDecoder(shallow_decode=1, bottleneck_size=(16, 16), dtype=dt)
dp = {"params": params["params"]["decoder"]}
dec_in = {"x": jnp.zeros((B, 8, 16, 16, 384), dt),
          "res": [jnp.zeros(s, dt) for s in res_shapes]}
device_time("decoder", lambda p, kw: dec.apply(p, kw["x"], kw["res"]), dp,
            dec_in, "x")

# ---- decoder sub-parts (per-level roofline attribution) ----
from strajnet_tpu.models.decoder import (FusedUpConv, TemporalConv,
                                         _apply_tail)

decp = params["params"]["decoder"]

# (part, param key, out features, in [T, H, W, Cin])
_DEC_UPS = [
    ("dec_up3", "upconv_3_0", 192, (8, 16, 16, 384)),
    ("dec_up2", "upconv_2_0", 128, (8, 32, 32, 192)),
    ("dec_up1", "upconv_1_0", 96, (8, 64, 64, 128)),
    ("dec_upf1", "upconvf_1_0", 96, (8, 64, 64, 128)),
]
for nm, key, feat, shp in _DEC_UPS:
    if nm not in PARTS:
        continue
    m = FusedUpConv(feat, dtype=dt)
    device_time(nm, lambda p, kw, _m=m: _m.apply(p, kw["x"]),
                {"params": decp[key]},
                {"x": jnp.zeros((B,) + shp, dt)}, "x")

# occ/flow tails: last FusedUpConv (96->48 @128^2 -> 256^2) + elu + outconv
for nm, upkey, outkey in [("dec_tail_occ", "upconv_0_0", "outconv"),
                          ("dec_tail_flow", "upconvf_0_0", "outconv_f")]:
    if nm not in PARTS:
        continue

    def _tail(p, kw, _u=upkey, _o=outkey):
        ku = p["params"][_u]["conv"]["kernel"]
        kb = p["params"][_u]["conv"]["bias"]
        ko = p["params"][_o]["kernel"]
        bo = p["params"][_o]["bias"]
        return _apply_tail(kw["x"], ku, kb, ko, bo, dt, False)

    device_time(nm, _tail, {"params": decp},
                {"x": jnp.zeros((B, 8, 128, 128, 96), dt)}, "x")

if "dec_res" in PARTS:
    # the three time-constant pyramid/flow skips together
    def _res_all(p, kw):
        a = TemporalConv(192, 8, 8, dtype=dt).apply(
            {"params": p["params"]["resconv_3"]}, kw["r1"])
        b_ = TemporalConv(128, 8, 8, dtype=dt).apply(
            {"params": p["params"]["resconv_2"]}, kw["r0"])
        c_ = TemporalConv(128, 8, 8, dtype=dt).apply(
            {"params": p["params"]["resconv_f"]}, kw["rf"])
        return (jnp.sum(a.astype(jnp.float32)) + jnp.sum(b_.astype(
            jnp.float32)) + jnp.sum(c_.astype(jnp.float32)))

    device_time("dec_res", _res_all, {"params": decp},
                {"r1": jnp.zeros((B, 1, 32, 32, 192), dt),
                 "r0": jnp.zeros((B, 1, 64, 64, 96), dt),
                 "rf": jnp.zeros((B, 1, 64, 64, 96), dt)}, "r1")

# ---- encoder sub-parts (pass part names on argv to select) ----
from strajnet_tpu.models.swin import BasicLayer, LayerNorm, PatchEmbed

encp = params["params"]["encoder"]


def _embed_all(p, kw):
    """The non-stage encoder work: 3 patch embeds + map pad + norms."""
    f = PatchEmbed((4, 4), 96, True, dt).apply(
        {"params": p["patch_embed_flow"]}, kw["flow"].astype(dt))
    f = LayerNorm(1e-5, dt).apply({"params": p["flow_norm"]}, f)
    x = PatchEmbed((4, 4), 96, True, dt).apply(
        {"params": p["patch_embed_vehicle"]}, kw["ogm"].astype(dt)[..., 0])
    maps = PatchEmbed((4, 4), 96, True, dt).apply(
        {"params": p["patch_embed_map"]}, kw["map_img"].astype(dt))
    maps = maps.reshape(-1, 64, 64, 96)
    maps = jnp.pad(maps, ((0, 0), (32, 32), (32, 32), (0, 0)))
    x = x + maps.reshape(-1, 128 * 128, 96)
    x = LayerNorm(1e-5, dt).apply({"params": p["all_patch_norm"]}, x)
    return x + jnp.sum(f)


device_time("enc_embed", _embed_all, encp, inputs, "flow")


def _stage(i, downsample):
    return BasicLayer(
        dim=96 * 2 ** i, input_resolution=(128 // 2 ** i, 128 // 2 ** i),
        depth=2, num_heads=(3, 6, 12)[i], window_size=8,
        drop_path=(0.0, 0.0), downsample=downsample,
        use_pallas=cfg.use_pallas_attention, dtype=dt)


for nm, key, i in [("enc_flow", "flow_layer", 0), ("enc_stage0", "layers0", 0),
                   ("enc_stage1", "layers1", 1), ("enc_stage2", "layers2", 2)]:
    if nm not in PARTS:
        continue
    L = 128 // 2 ** i
    st_in = {"x": jnp.zeros((B, L * L, 96 * 2 ** i), dt)}
    device_time(nm,
                lambda p, kw, _m=_stage(i, i < 2): jax.tree.leaves(
                    _m.apply(p, kw["x"], True))[0],
                {"params": encp[key]}, st_in, "x")
