"""Real-time interactive viewer / teleop over HTTP.

The reference's human mode is a pyglet window with arrow-key teleop and
demo recording (/root/reference/magical/__main__.py:92-171,
gym_render.py:547-605).  This box is headless, so the TPU-native build
serves the same interaction over HTTP instead of GL: a stdlib
ThreadingHTTPServer streams PNG frames of the allocentric view to a
browser canvas at the env frame rate and receives held-key state from
the page's keydown/keyup handlers.  Controls match the reference
(README.md:56-60): arrows move, space closes the grippers, R resets.
Demo recording matches the reference flow: auto-starts on the first
non-null action, saves the gzip-pickled
{'env_name', 'trajectory', 'score'} payload at episode end
(__main__.py:128-159).

Usage:  python -m magical_tpu --serve 8712 [--record DIR]
then open http://localhost:8712/ .
"""

from __future__ import annotations

import json
import struct
import threading
import time
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><title>magical_tpu viewer</title><style>
body { background:#222; color:#eee; font-family:monospace;
       display:flex; flex-direction:column; align-items:center; }
img  { image-rendering:pixelated; width:576px; height:576px;
       border:1px solid #555; margin-top:12px; }
#hud { margin-top:8px; }
</style></head><body>
<div>magical_tpu — arrows move &middot; space grips &middot; R resets</div>
<img id="view" src="/frame.png">
<div id="hud"></div>
<script>
const held = new Set();
const keymap = {ArrowUp:'up', ArrowDown:'down', ArrowLeft:'left',
                ArrowRight:'right', ' ':'close', r:'reset', R:'reset'};
function send() {
  fetch('/keys', {method:'POST', body:JSON.stringify([...held])});
}
addEventListener('keydown', e => { const k = keymap[e.key];
  if (k) { e.preventDefault(); if (!held.has(k)) { held.add(k); send(); } }});
addEventListener('keyup', e => { const k = keymap[e.key];
  if (k) { e.preventDefault(); held.delete(k); send(); }});
setInterval(send, 500);
const img = document.getElementById('view');
function refresh() {
  fetch('/frame.png?' + Date.now()).then(r => r.blob()).then(b => {
    img.src = URL.createObjectURL(b);
    fetch('/state').then(r => r.json()).then(s => {
      document.getElementById('hud').textContent =
        `ep ${s.episode}  t ${s.t}  score ${s.score}` +
        (s.recording ? '  [REC]' : '');
    });
    setTimeout(refresh, 1000 / 12);
  }).catch(() => setTimeout(refresh, 500));
}
refresh();
</script></body></html>"""


def encode_png(rgb, level=1):
    """Minimal 8-bit RGB PNG encoder (stdlib only)."""
    h, w, _ = rgb.shape
    raw = b''.join(b'\x00' + rgb[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return (struct.pack('>I', len(data)) + c
                + struct.pack('>I', zlib.crc32(c) & 0xffffffff))

    return (b'\x89PNG\r\n\x1a\n'
            + chunk(b'IHDR', struct.pack('>IIBBBBB', w, h, 8, 2, 0, 0, 0))
            + chunk(b'IDAT', zlib.compress(raw, level))
            + chunk(b'IEND', b''))


class Session:
    """Env stepping loop driven by the latest held-key state."""

    def __init__(self, env_name, record_dir=None, fps=None, seed=None):
        import magical_tpu
        magical_tpu.register_envs()
        self.env_name = env_name
        self.env = magical_tpu.make(env_name)
        if seed is not None:
            self.env.seed(seed)
        self.fps = fps or getattr(self.env, 'fps', 8.0)
        self.record_dir = record_dir
        self.lock = threading.Lock()
        self.keys = set()
        self.frame_png = encode_png(np.zeros((8, 8, 3), np.uint8))
        self.t = 0
        self.episode = 0
        self.score = 0.0
        self.recording = False
        self.stop = False
        self._traj = None
        self._obs = None

    # -- key state -> reference action grammar ---------------------------

    def action(self):
        from magical_tpu import constants as C
        with self.lock:
            keys = set(self.keys)
        up = 'up' in keys
        down = 'down' in keys
        name = (('Up' if up and not down else '')
                + ('Down' if down and not up else '')
                + ('Left' if 'left' in keys and 'right' not in keys else '')
                + ('Right' if 'right' in keys and 'left' not in keys else '')
                + ('Close' if 'close' in keys else 'Open'))
        return C.ACTION_NAMES.index(name), ('reset' in keys)

    def _begin_episode(self):
        self._obs = self.env.reset()
        self.t = 0
        self.score = 0.0
        self.recording = False
        self._traj = {'obs': [self._obs], 'acts': [], 'rews': [],
                      'infos': []}

    def _save(self, score):
        if not (self.record_dir and self.recording):
            return
        import datetime
        import os

        from magical_tpu.data.trajectories import (MAGICALTrajectory,
                                                   save_demo)
        os.makedirs(self.record_dir, exist_ok=True)
        stamp = datetime.datetime.now().strftime('%FT%H:%M:%S')
        path = os.path.join(
            self.record_dir,
            f'demo-{self.env_name}-{stamp}-{self.episode}.pkl.gz')
        obs0 = self._traj['obs'][0]
        if isinstance(obs0, dict):
            obs = {k: np.stack([o[k] for o in self._traj['obs']])
                   for k in obs0}
        else:
            obs = np.stack(self._traj['obs'])
        save_demo(path, self.env_name, MAGICALTrajectory(
            acts=np.asarray(self._traj['acts']), obs=obs,
            rews=np.asarray(self._traj['rews']),
            infos=self._traj['infos']), score)
        print('saved', path, flush=True)

    def run(self):
        self._begin_episode()
        while not self.stop:
            t0 = time.time()
            act, want_reset = self.action()
            if want_reset:
                self._begin_episode()
                time.sleep(0.25)        # debounce R
                continue
            # recording auto-starts on the first non-null action
            # (reference __main__.py:128-131; NOOP = Open with no move)
            from magical_tpu import constants as C
            if act != C.ACTION_NAMES.index('Open'):
                self.recording = True
            obs, rew, done, info = self.env.step(act)
            self._traj['obs'].append(obs)
            self._traj['acts'].append(act)
            self._traj['rews'].append(rew)
            self._traj['infos'].append(info)
            self._obs = obs
            self.t += 1
            if isinstance(obs, dict) and 'allo' in obs:
                frame = obs['allo']         # raw 384x384 allo view
            else:
                frames = self.env.render()
                frame = (frames['allo'] if isinstance(frames, dict)
                         else frames)
            png = encode_png(np.asarray(frame))
            with self.lock:
                self.frame_png = png
            if done:
                self.score = float(info['eval_score'])
                print(f'episode {self.episode}: len {self.t} '
                      f'score {self.score:.3f}', flush=True)
                self._save(self.score)
                self.episode += 1
                self._begin_episode()
            dt = time.time() - t0
            if dt < 1.0 / self.fps:
                time.sleep(1.0 / self.fps - dt)


def serve(env_name, port=8712, record_dir=None, fps=None, seed=None,
          open_msg=True, host='127.0.0.1'):
    session = Session(env_name, record_dir=record_dir, fps=fps, seed=seed)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):            # quiet
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.send_header('Cache-Control', 'no-store')
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split('?')[0]
            if path == '/':
                self._send(200, 'text/html', PAGE.encode())
            elif path == '/frame.png':
                with session.lock:
                    png = session.frame_png
                self._send(200, 'image/png', png)
            elif path == '/state':
                body = json.dumps(dict(
                    t=session.t, episode=session.episode,
                    score=round(session.score, 3),
                    recording=session.recording)).encode()
                self._send(200, 'application/json', body)
            else:
                self._send(404, 'text/plain', b'not found')

        def do_POST(self):
            if self.path == '/keys':
                n = int(self.headers.get('Content-Length', 0))
                try:
                    keys = set(json.loads(self.rfile.read(n) or b'[]'))
                except ValueError:
                    keys = set()
                with session.lock:
                    session.keys = keys
                self._send(200, 'text/plain', b'ok')
            else:
                self._send(404, 'text/plain', b'not found')

    # loopback by default: the viewer can teleop the env and (with
    # --record) write demo files, so exposing it must be deliberate
    server = ThreadingHTTPServer((host, port), Handler)
    stepper = threading.Thread(target=session.run, daemon=True)
    stepper.start()
    if open_msg:
        print(f'serving {env_name} on http://localhost:{port}/ '
              f'(arrows move, space grips, R resets'
              + (f'; recording to {record_dir}' if record_dir else '')
              + ')', flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        session.stop = True
        server.server_close()
    return session
