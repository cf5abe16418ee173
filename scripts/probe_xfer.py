"""Measure host->TPU transfer paths through the axon tunnel:
jnp.asarray vs jax.device_put, blocking behavior, bandwidth."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    for mb in (64, 256):
        a = np.random.randint(0, 1 << 30, (mb * 256 * 1024,),
                              dtype=np.int32)
        t0 = time.time()
        x = jnp.asarray(a)
        t1 = time.time()
        np.asarray(jax.device_get(x[:8]))
        t2 = time.time()
        print(f"asarray {mb}MB: enqueue {t1-t0:.1f}s, "
              f"sync {t2-t1:.1f}s", flush=True)
        del x
        t0 = time.time()
        y = jax.device_put(a)
        t1 = time.time()
        np.asarray(jax.device_get(y[:8]))
        t2 = time.time()
        print(f"device_put {mb}MB: enqueue {t1-t0:.1f}s, "
              f"sync {t2-t1:.1f}s", flush=True)
        del y


if __name__ == "__main__":
    main()
