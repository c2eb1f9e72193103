import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from orbslam3_tpu.kernels import fast as fast_k, image as image_k, orb_descriptor as desc_k
from orbslam3_tpu.vision.frame import extract_features

H, W = 480, 752
img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (H, W)), jnp.float32)

def ctime(name, fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    print(f"{name:30s} compile {time.perf_counter()-t0:8.1f}s", flush=True)
    return c

ctime("build_atlas", lambda x: image_k.build_atlas(x), img)
rows, ah, aw = image_k.atlas_layout(H, W)
atlas = jnp.zeros((ah, aw), jnp.float32)
ctime("detect(atlas)", lambda x: fast_k.detect(x), atlas)
ctime("orientation_maps(atlas)", lambda x: desc_k.orientation_maps(x), atlas)
ctime("blur(atlas)", lambda x: image_k.gaussian_blur(x), atlas)
score = jnp.zeros((480, 752), jnp.float32)
ctime("select_uniform", lambda s: fast_k.select_uniform(s, 217, 32), score)
ys = jnp.zeros(1000, jnp.int32); xs = jnp.zeros(1000, jnp.int32); ang = jnp.zeros(1000, jnp.float32)
ctime("brief(1000)", lambda a,b,c,d: desc_k.brief_descriptors(a,b,c,d), atlas, ys, xs, ang)
ctime("extract_features(full)", lambda x: extract_features(x, n_features=1000), img)
