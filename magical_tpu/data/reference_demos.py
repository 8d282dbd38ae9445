"""Reference-demo downloader.

Mirrors /root/reference/magical/reference_demos.py: fetch & extract
github.com/qxcv/magical-data into a local `demos/` directory with a
`.download-done` marker.  Uses urllib (no `requests` dependency); in
air-gapped environments the download step fails gracefully and users can
point `demo_dir` at an existing extracted tree.
"""

from __future__ import annotations

import io
import os
import sys
import urllib.request
import zipfile

DEMO_URL = 'https://github.com/qxcv/magical-data/archive/master.zip'
DONE_MARKER = '.download-done'


class DownloadError(Exception):
    pass


def try_download_demos(dest='demos', progress=True):
    """reference_demos.py:44-129 — idempotent download+extract."""
    marker = os.path.join(dest, DONE_MARKER)
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)
    try:
        with urllib.request.urlopen(DEMO_URL) as resp:
            total = resp.headers.get('Content-Length')
            chunks = []
            read = 0
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                chunks.append(chunk)
                read += len(chunk)
                if progress:
                    tot = f'/{int(total)//(1<<20)}MiB' if total else ''
                    print(f'\rdownloaded {read>>20}MiB{tot}', end='',
                          file=sys.stderr)
            data = b''.join(chunks)
    except Exception as ex:          # pragma: no cover - network dependent
        raise DownloadError(
            f'could not download demos from {DEMO_URL}: {ex}') from ex
    if progress:
        print(file=sys.stderr)

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            # strip the leading "magical-data-master/" component
            parts = info.filename.split('/')[1:]
            if not parts:
                continue
            out_path = os.path.join(dest, *parts)
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            with zf.open(info) as src, open(out_path, 'wb') as dst:
                dst.write(src.read())

    with open(marker, 'w') as f:
        f.write('done\n')
    return dest


def _main():                          # pragma: no cover - CLI
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--dest', default='demos')
    args = p.parse_args()
    try_download_demos(args.dest)


if __name__ == '__main__':            # pragma: no cover
    _main()
