"""Render saved demos to video/frames.

Counterpart of /root/reference/magical/misc/render_demos.py (demos ->
mp4 via scikit-video).  Uses ffmpeg directly when present, else dumps
PPM frames.

    python -m magical_tpu.tools.render_demos demo1.pkl.gz --out-dir vids/
"""

import argparse
import os
import shutil
import subprocess
import tempfile

import numpy as np


def frames_from_demo(demo):
    traj = demo['trajectory']
    obs = traj.obs
    if isinstance(obs, dict):
        frames = obs.get('allo', next(iter(obs.values())))
    else:
        frames = obs
        if frames.ndim == 4 and frames.shape[-1] > 3:
            frames = frames[..., -3:]   # newest frame of a channel stack
    return np.asarray(frames)


def write_video(frames, out_path, fps=8):
    ffmpeg = shutil.which('ffmpeg')
    if ffmpeg is None:
        base = os.path.splitext(out_path)[0]
        os.makedirs(base, exist_ok=True)
        for i, f in enumerate(frames):
            with open(os.path.join(base, f'{i:05d}.ppm'), 'wb') as fp:
                fp.write(b'P6\n%d %d\n255\n' % (f.shape[1], f.shape[0]))
                fp.write(np.ascontiguousarray(f).tobytes())
        return base
    with tempfile.TemporaryDirectory() as td:
        for i, f in enumerate(frames):
            with open(os.path.join(td, f'{i:05d}.ppm'), 'wb') as fp:
                fp.write(b'P6\n%d %d\n255\n' % (f.shape[1], f.shape[0]))
                fp.write(np.ascontiguousarray(f).tobytes())
        subprocess.run(
            [ffmpeg, '-y', '-framerate', str(fps), '-i',
             os.path.join(td, '%05d.ppm'), '-pix_fmt', 'yuv420p', out_path],
            check=True, capture_output=True)
    return out_path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('demos', nargs='+')
    p.add_argument('--out-dir', default='demo-videos')
    p.add_argument('--fps', type=int, default=8)
    args = p.parse_args()

    from magical_tpu.data.trajectories import load_demos
    os.makedirs(args.out_dir, exist_ok=True)
    for path, demo in zip(args.demos, load_demos(args.demos)):
        frames = frames_from_demo(demo)
        stem = os.path.splitext(os.path.basename(path))[0]
        out = write_video(frames, os.path.join(args.out_dir, stem + '.mp4'),
                          args.fps)
        print(f'{path} -> {out} ({len(frames)} frames)')


if __name__ == '__main__':
    main()
