#!/usr/bin/env python
"""Generate the pixel-fidelity audit gallery (docs/frames/).

For every task's Demo-variant reset (fixed seed), renders the allo and
ego views at both fidelities and writes PNGs.  These are the concrete
frames future rounds (or any environment that can run the reference)
can diff against the reference pipeline's output
(/root/reference/magical/gym_render.py:208-249 + cv2.INTER_AREA).

Run on CPU (the XLA renderer is the reference semantics; tests pin the
Pallas kernels against it):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu MAGICAL_TPU_PALLAS=0 \
      python scripts/gen_frame_gallery.py
"""
import os
import struct
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jaxcc')

import jax                                                    # noqa: E402
import numpy as np                                            # noqa: E402

from magical_tpu.core import render as R                      # noqa: E402
from magical_tpu.tasks import ALL_TASKS                       # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'docs', 'frames')


def write_png(path, rgb):
    """Minimal 8-bit RGB PNG writer (stdlib only)."""
    h, w, _ = rgb.shape
    raw = b''.join(b'\x00' + rgb[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return (struct.pack('>I', len(data)) + c
                + struct.pack('>I', zlib.crc32(c) & 0xffffffff))

    with open(path, 'wb') as f:
        f.write(b'\x89PNG\r\n\x1a\n')
        f.write(chunk(b'IHDR', struct.pack('>IIBBBBB', w, h, 8, 2,
                                           0, 0, 0)))
        f.write(chunk(b'IDAT', zlib.compress(raw, 9)))
        f.write(chunk(b'IEND', b''))


def main():
    os.makedirs(OUT, exist_ok=True)
    key = jax.random.PRNGKey(0)
    for name, task in sorted(ALL_TASKS.items()):
        st = jax.jit(lambda k, t=task: t.reset_fn(
            k, t.flags_for('Demo')))(key)
        # lo/hi 96: the two observation pipelines; lo384: a full-res
        # frame (the analogue of the reference's pre-resize 384 GL
        # frame, with analytic AA standing in for GL_LINE_SMOOTH)
        for fidelity, res in (('lo', 96), ('hi', 96), ('lo384', 384)):
            fid = 'lo' if fidelity == 'lo384' else fidelity
            rf = name == 'MoveToCorner'
            out = jax.jit(lambda s, t=task, fid=fid, res=res, rf=rf:
                          R.render_views(s, t.max_blocks, t.max_goals,
                                         rf, res=res,
                                         views=('allo', 'ego'),
                                         fidelity=fid))(st)
            for view in ('allo', 'ego'):
                img = np.asarray(out[view])
                path = os.path.join(
                    OUT, f'{name}-Demo-{view}-{fidelity}.png')
                write_png(path, img)
        print(f'{name}: wrote 6 frames', flush=True)
    print(f'gallery in {OUT}')


if __name__ == '__main__':
    main()
