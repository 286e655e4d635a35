import sys, types, time
sys.path.insert(0, "/root/repo")
ma = types.ModuleType("monotonic_align"); ma.maximum_path = lambda *a, **k: None
sys.modules["monotonic_align"] = ma
sys.path.insert(0, "/root/reference/lib")
import numpy as np, torch
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import infer_pack.models as M
from rvc_tpu.compat.torch_import import synthesizer_params_from_state_dict
from rvc_tpu.models.synthesizer import Synthesizer
from rvc_tpu.models import nsf as nsf_mod
from rvc_tpu.bench.parity import mel_distance_db

CFG = dict(spec_channels=1025, segment_size=32, inter_channels=192, hidden_channels=192,
  filter_channels=768, n_heads=2, n_layers=6, kernel_size=3, p_dropout=0.0, resblock="1",
  resblock_kernel_sizes=[3,7,11], resblock_dilation_sizes=[[1,3,5]]*3,
  upsample_rates=[10,10,2,2], upsample_initial_channel=512,
  upsample_kernel_sizes=[16,16,4,4], spk_embed_dim=109, gin_channels=256, sr=40000)
torch.manual_seed(0)
ref = M.SynthesizerTrnMs768NSFsid(**CFG, is_half=False).eval()
rng = np.random.default_rng(7)
B, T = 1, 100  # 1 second at 100 Hz frames
phone = rng.standard_normal((B, T, 768)).astype(np.float32)
pitch = rng.integers(1, 255, (B, T))
nsff0 = rng.uniform(100, 300, (B, T)).astype(np.float32)
torch.randn_like_orig = torch.randn_like
torch.randn_like = lambda x: torch.zeros_like(x)
torch.rand_orig = torch.rand
torch.rand = lambda *s, **k: torch.zeros(*s, **k)
t0=time.perf_counter()
with torch.no_grad():
    o_ref, _, _ = ref.infer(torch.from_numpy(phone), torch.LongTensor([T]),
        torch.from_numpy(pitch).long(), torch.from_numpy(nsff0), torch.LongTensor([5]))
o_ref = o_ref[0,0].numpy()
print(f"torch ref done {time.perf_counter()-t0:.1f}s, {o_ref.shape}")
orig_sine = nsf_mod.sine_source
nsf_mod.sine_source = lambda f0, upp, sr_, key, harmonic_num=0, sine_amp=0.1, noise_std=0.003, voiced_threshold=0.0: \
    orig_sine(f0, upp, sr_, jax.random.PRNGKey(0), harmonic_num, sine_amp, 0.0, voiced_threshold)
mine = Synthesizer(**{**CFG,
  "resblock_kernel_sizes": (3,7,11), "resblock_dilation_sizes": ((1,3,5),)*3,
  "upsample_rates": (10,10,2,2), "upsample_kernel_sizes": (16,16,4,4)},
  feature_dim=768, use_f0=True)
params = {"params": synthesizer_params_from_state_dict(ref.state_dict())}
t0=time.perf_counter()
o_mine, _, _ = mine.apply(params, jnp.asarray(phone), jnp.asarray([T]), jnp.asarray(pitch),
    jnp.asarray(nsff0), jnp.asarray([5]), 0.0, method=mine.infer, rngs={"noise": jax.random.PRNGKey(0)})
o_mine = np.asarray(o_mine)[0,:,0]
print(f"flax done {time.perf_counter()-t0:.1f}s")
print("max abs diff:", float(np.abs(o_mine - o_ref).max()))
print("mel distance dB:", mel_distance_db(o_mine, o_ref, 40000))
