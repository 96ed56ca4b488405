"""Stage-by-stage pipeline parity vs the torch reference.

Each pipeline stage (cleaner, prepare_condition, ControlLDM forward, VAE
decode) is compared on IDENTICAL inputs/weights; all must match to fp32
tolerance. This pins the orchestration-level math exactly; the end-to-end
test (test_pipeline_parity.py) then only measures recursion-amplified fp
noise.
"""
import numpy as np, pytest, torch, jax, jax.numpy as jnp
from tests.ref_loader import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")
import sys
from tests.test_pipeline_parity import (UNET_TINY, VAE_TINY, CLIP_TINY,
    load_reference_model_pkg, torch_sd_to_numpy)
from diffbir_tpu.weights.convert import fill_flax_params

def test_pipeline_stage_parity(monkeypatch):
    ref = load_reference_model_pkg()
    sys.path.insert(0, "/root/reference")
    torch.manual_seed(0)
    cn_cfg = dict(UNET_TINY, hint_channels=4); cn_cfg.pop("out_channels")
    tm = ref.ControlLDM(unet_cfg=UNET_TINY, vae_cfg=dict(ddconfig=VAE_TINY, embed_dim=4),
        clip_cfg=CLIP_TINY, controlnet_cfg=cn_cfg, latent_scale_factor=0.18215).eval()
    with torch.no_grad():
        for _, p in tm.named_parameters():
            if p.abs().sum() == 0: p.normal_(0, 0.02)
    t_swin = ref.SwinIR(img_size=8, patch_size=1, in_chans=3, embed_dim=24, depths=[2],
        num_heads=[4], window_size=4, mlp_ratio=2, sf=8, img_range=1.0,
        upsampler="nearest+conv", resi_connection="1conv", unshuffle=True,
        unshuffle_scale=8, drop_path_rate=0.0).eval()

    from diffbir_tpu.models.clip import CLIPTextEncoder
    from diffbir_tpu.models.cldm import ControlLDM
    from diffbir_tpu.models.swinir import SwinIR
    from diffbir_tpu.models.tokenizer import get_tokenizer
    from diffbir_tpu.models.unet import ControlNet, UNetModel
    from diffbir_tpu.models.vae import AutoencoderKL
    jcldm = ControlLDM(
        unet=UNetModel(model_channels=32, num_head_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(2, 1), context_dim=64, num_res_blocks=1),
        vae=AutoencoderKL(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1),
        clip=CLIPTextEncoder(width=64, heads=4, layers=3),
        controlnet=ControlNet(model_channels=32, num_head_channels=16, channel_mult=(1, 2),
                              attention_resolutions=(2, 1), context_dim=64, num_res_blocks=1))
    shapes = jcldm.eval_shapes((8, 8))
    sd = {}
    for name, prefix in [("unet", "model.diffusion_model."), ("vae", "first_stage_model."), ("clip", "cond_stage_model.")]:
        for k, v in torch_sd_to_numpy(getattr(tm, name)).items():
            sd[prefix + k] = v
    params = jcldm.load_pretrained_sd(shapes, sd)
    params = jcldm.load_controlnet_from_ckpt(params, torch_sd_to_numpy(tm.controlnet))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    jswin = SwinIR(embed_dim=24, depths=(2,), num_heads=(4,), window_size=4,
                   mlp_ratio=2.0, sf=8, unshuffle=True, unshuffle_scale=8)
    sshapes = jax.eval_shape(jswin.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    sparams, _, _ = fill_flax_params(sshapes, torch_sd_to_numpy(t_swin), strict=True)
    sparams = jax.tree_util.tree_map(jnp.asarray, sparams)

    g = np.random.default_rng(1)
    lq = (g.random((1, 512, 512, 3))).astype(np.float32)

    # stage 1: cleaner
    with torch.no_grad():
        t_clean = t_swin(torch.from_numpy(lq.transpose(0,3,1,2))).numpy().transpose(0,2,3,1)
    j_clean = np.asarray(jswin.apply(sparams, jnp.asarray(lq)))
    assert np.abs(t_clean - j_clean).max() < 1e-5

    cond_img_t = torch.from_numpy(t_clean.transpose(0,3,1,2))
    cond_img_j = jnp.asarray(t_clean)  # use SAME condition for both

    # stage 2: prepare_condition
    with torch.no_grad():
        t_cond = tm.prepare_condition(cond_img_t, ["a photo"])
    tok = get_tokenizer()(["a photo"])
    j_cond = jcldm.prepare_condition(params, cond_img_j, jnp.asarray(tok))
    assert np.abs(t_cond["c_txt"].numpy() - np.asarray(j_cond["c_txt"])).max() < 1e-4
    assert np.abs(t_cond["c_img"].numpy().transpose(0,2,3,1) - np.asarray(j_cond["c_img"])).max() < 1e-4

    # stage 3: one cldm forward at fixed x,t using SAME cond (torch's)
    x = g.standard_normal((1,4,64,64)).astype(np.float32)
    with torch.no_grad():
        t_eps = tm(torch.from_numpy(x), torch.tensor([501]), t_cond).numpy()
    jc = {"c_txt": jnp.asarray(t_cond["c_txt"].numpy()), "c_img": jnp.asarray(t_cond["c_img"].numpy().transpose(0,2,3,1))}
    j_eps = np.asarray(jcldm(params, jnp.asarray(x.transpose(0,2,3,1)), jnp.array([501.0]), jc))
    assert np.abs(t_eps.transpose(0,2,3,1) - j_eps).max() < 1e-4

    # stage 4: decode same z
    z = (g.standard_normal((1,4,64,64)) * 1.0).astype(np.float32)
    with torch.no_grad():
        t_dec = tm.vae_decode(torch.from_numpy(z)).numpy().transpose(0,2,3,1)
    j_dec = np.asarray(jcldm.vae_decode(params, jnp.asarray(z.transpose(0,2,3,1))))
    assert np.abs(t_dec - j_dec).max() < 1e-4
