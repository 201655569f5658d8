"""SingVisio-equivalent: interactive inspection of diffusion denoising steps.

Reference: `visualization/SingVisio/webpage/server.py:12-50` — a Flask API
with sklearn KMeans key-step selection over saved DiffSVC step artifacts +
a web UI. Re-implemented dependency-free: step dumping hooks for the
diffusion samplers, a native k-means key-step selector, and a stdlib
`http.server` JSON API + minimal built-in page.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path

import numpy as np


def dump_diffusion_steps(step_mels: list[np.ndarray], output_dir: str | Path,
                         uid: str) -> Path:
    """Save per-step mel artifacts (call with the sampler's intermediate
    states) → <output_dir>/<uid>/step_####.npy + manifest."""
    out = Path(output_dir) / uid
    out.mkdir(parents=True, exist_ok=True)
    for i, m in enumerate(step_mels):
        np.save(out / f"step_{i:04d}.npy", np.asarray(m))
    manifest = {"uid": uid, "n_steps": len(step_mels),
                "shape": list(np.asarray(step_mels[0]).shape)}
    (out / "manifest.json").write_text(json.dumps(manifest))
    return out


def _kmeans(x: np.ndarray, k: int, iters: int = 50, seed: int = 0):
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        new = np.stack([
            x[assign == j].mean(0) if (assign == j).any() else centers[j]
            for j in range(k)
        ])
        if np.allclose(new, centers):
            break
        centers = new
    return assign, centers


def select_key_steps(step_dir: str | Path, n_key_steps: int = 6) -> list[int]:
    """KMeans over flattened step mels → one representative step per cluster
    (ref `server.py:16-47`)."""
    step_dir = Path(step_dir)
    files = sorted(step_dir.glob("step_*.npy"))
    feats = np.stack([np.load(f).reshape(-1) for f in files])
    k = min(n_key_steps, len(files))
    assign, centers = _kmeans(feats, k)
    keys = []
    for j in range(k):
        members = np.where(assign == j)[0]
        d = ((feats[members] - centers[j]) ** 2).sum(-1)
        keys.append(int(members[d.argmin()]))
    return sorted(keys)


_PAGE = """<!doctype html><html><head><title>SingVisio (amphion_tpu)</title>
<style>body{font-family:sans-serif;margin:2em}img{image-rendering:pixelated}</style>
</head><body><h2>Diffusion step explorer</h2>
<div id=list></div><canvas id=c width=800 height=200></canvas>
<script>
fetch('/api/experiments').then(r=>r.json()).then(exps=>{
 const d=document.getElementById('list');
 exps.forEach(e=>{const b=document.createElement('button');b.textContent=e;
  b.onclick=()=>load(e);d.appendChild(b);});});
function load(uid){fetch('/api/steps?uid='+uid).then(r=>r.json()).then(info=>{
 const d=document.getElementById('list');
 info.key_steps.forEach(s=>{show(uid,s);});});}
function show(uid,step){fetch('/api/mel?uid='+uid+'&step='+step)
 .then(r=>r.json()).then(m=>{const c=document.getElementById('c');
 const ctx=c.getContext('2d');const h=m.data.length,w=m.data[0].length;
 const im=ctx.createImageData(w,h);
 let lo=1e9,hi=-1e9;m.data.flat().forEach(v=>{lo=Math.min(lo,v);hi=Math.max(hi,v)});
 for(let i=0;i<h;i++)for(let j=0;j<w;j++){const v=(m.data[h-1-i][j]-lo)/(hi-lo);
  const o=4*(i*w+j);im.data[o]=255*v;im.data[o+1]=80*v;im.data[o+2]=255*(1-v);
  im.data[o+3]=255;}
 ctx.putImageData(im,0,0);});}
</script></body></html>"""


class _Handler(BaseHTTPRequestHandler):
    root: Path = Path(".")

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        if url.path == "/":
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif url.path == "/api/experiments":
            exps = sorted(
                p.name for p in self.root.iterdir()
                if p.is_dir() and (p / "manifest.json").is_file()
            )
            self._json(exps)
        elif url.path == "/api/steps":
            d = self.root / q["uid"]
            manifest = json.loads((d / "manifest.json").read_text())
            manifest["key_steps"] = select_key_steps(d)
            self._json(manifest)
        elif url.path == "/api/mel":
            m = np.load(self.root / q["uid"] / f"step_{int(q['step']):04d}.npy")
            if m.ndim == 3:
                m = m[0]
            self._json({"step": int(q["step"]), "data": m.tolist()})
        else:
            self._json({"error": "not found"}, 404)


def serve(artifact_dir: str | Path, port: int = 8868):
    """Serve the step explorer over the dumped artifacts."""
    _Handler.root = Path(artifact_dir)
    httpd = HTTPServer(("127.0.0.1", port), _Handler)
    print(f"SingVisio explorer at http://127.0.0.1:{port}")
    httpd.serve_forever()
