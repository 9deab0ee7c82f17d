import time, functools
import numpy as np
import jax, jax.numpy as jnp
from nemo_tpu.ops import fourier, imageops, solve as solve_ops
from nemo_tpu.ops import noise as noise_ops

nf, ny, nx = 2, 896, 1536
nT = 4
rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(0,30,(nT,nf,ny,nx)).astype(np.float32))
m2 = data[:,0]
apodM = jnp.asarray(np.asarray(fourier.apod_mask((ny,nx),10)).astype(np.float32))

def bench(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0=time.time()
    for _ in range(10): out = jax.block_until_ready(f(*args))
    print(f"{name}: {(time.time()-t0)/10*1000:.2f} ms", flush=True)

bench("fft2 batch (nT,nf)", lambda x: fourier.fft2(x*apodM[None,None]), data)
def noisecov(x):
    fN = fourier.fft2(x*apodM[None,None])
    prods = jnp.real(fN[:,:,None]*jnp.conj(fN[:,None,:]))
    return imageops.gaussian_filter(prods.reshape((-1,ny,nx)), (3,3))
bench("noisecov+smooth", noisecov, data)
def solvestep(x):
    fN = fourier.fft2(x*apodM[None,None])
    prods = jnp.real(fN[:,:,None]*jnp.conj(fN[:,None,:]))
    N = imageops.gaussian_filter(prods.reshape((-1,ny,nx)), (3,3)).reshape(nT,nf,nf,ny,nx)
    A = jnp.moveaxis(N, (1,2), (-2,-1))
    b = jnp.moveaxis(jnp.abs(fN), 1, -1)
    return solve_ops.solve_small(A, b)
bench("cov+smooth+solve", solvestep, data)
bench("rms grid", jax.vmap(lambda x: noise_ops.grid_rms_map(x, 80)), m2)
bench("minfilt 240", lambda x: imageops.minimum_filter(x, 240), m2)
bench("maxfilt3+topk", lambda x: jax.lax.top_k(jnp.where(x>=imageops.maximum_filter(x,3), x, 0).reshape(nT,-1), 256), m2)
