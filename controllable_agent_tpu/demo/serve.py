"""Minimal HTTP demo server.

The serving equivalent of the reference's Streamlit app (demo/main.py):
loads a trained workspace checkpoint, then serves a form where the user
types a reward equation (e.g. ``vx > 2`` or ``exp(-(x-8)**2) * up``); the
agent's zero-shot z is inferred and a rollout video is returned.

stdlib-only (http.server) so it runs on a bare TPU host:

    python -m controllable_agent_tpu.demo.serve folder=/path/to/xp [port=8501]
"""

from __future__ import annotations

import html
import sys
import typing as tp
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

_PAGE = """<!DOCTYPE html>
<html><head><title>controllable_agent_tpu demo</title></head>
<body style="font-family: sans-serif; max-width: 640px; margin: 2em auto">
<h2>Zero-shot reward demo</h2>
<p>Type a reward equation over {names}. Examples: <code>vx > 2</code>,
<code>exp(-(x-8)**2) * up</code>, <code>-vx</code>.</p>
<form method="get" action="/run">
  <input name="equation" style="width: 70%" value="{equation}"/>
  <button type="submit">Run</button>
</form>
{result}
</body></html>"""


def _build_engine(folder: str):
    from ..pretrain import build_workspace
    from .core import DemoEngine
    # folder-only args: build_workspace restores the run's full saved
    # config.json (workspace fields AND resolved agent.* keys) as the
    # base, so the checkpoint loads into identically-shaped networks
    ws = build_workspace([f"folder={folder}"], offline=True)
    engine = DemoEngine(ws)
    return engine


class _Handler(BaseHTTPRequestHandler):
    engine: tp.Any = None
    video_dir: Path = Path("/tmp/demo_videos")

    def do_GET(self) -> None:  # noqa: N802 (stdlib API)
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        if parsed.path == "/video":
            self._serve_video(qs.get("name", [""])[0])
            return
        equation = qs.get("equation", [""])[0]
        result = ""
        if parsed.path == "/run" and equation:
            try:
                self.video_dir.mkdir(parents=True, exist_ok=True)
                out = self.engine.run(
                    equation, video_path=str(self.video_dir / "rollout.gif"))
                video_html = ""
                if out.get("video"):
                    video_html = '<img src="/video?name=rollout.gif"/>'
                result = (f"<p>reward: {out['reward']:.2f} over "
                          f"{out['steps']} steps</p>{video_html}")
            except ValueError as e:  # whitelist violation
                result = f"<p style='color:red'>{html.escape(str(e))}</p>"
        body = _PAGE.format(
            names=", ".join(self.engine.feature_names),
            equation=html.escape(equation), result=result)
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(body.encode())

    def _serve_video(self, name: str) -> None:
        path = self.video_dir / "eval_video" / Path(name).name
        if not path.exists():
            path = self.video_dir / Path(name).name
        if path.exists():
            self.send_response(200)
            self.send_header("Content-Type", "image/gif")
            self.end_headers()
            self.wfile.write(path.read_bytes())
        else:
            self.send_response(404)
            self.end_headers()


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    folder = None
    port = 8501
    for arg in argv:
        if arg.startswith("folder="):
            folder = arg.split("=", 1)[1]
        elif arg.startswith("port="):
            port = int(arg.split("=", 1)[1])
    assert folder is not None, "usage: ... folder=/path/to/xp [port=8501]"
    _Handler.engine = _build_engine(folder)
    server = HTTPServer(("0.0.0.0", port), _Handler)
    print(f"demo serving on http://0.0.0.0:{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
