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


def mel_to_png(m: np.ndarray, zoom: int = 3) -> bytes:
    """Render a (n_mel, T) mel to an inferno-ish PNG — dependency-free
    encoder (zlib deflate + hand-built chunks). Server-side rendering keeps
    the page light (the JSON mel of a 30 s clip is ~10 MB; its PNG ~50 kB)."""
    import struct
    import zlib

    m = np.asarray(m, np.float32)
    if m.ndim == 3:
        m = m[0]
    lo, hi = float(m.min()), float(m.max())
    v = (m - lo) / max(hi - lo, 1e-9)
    v = v[::-1]  # low mel bins at the bottom
    v = np.repeat(np.repeat(v, zoom, axis=0), zoom, axis=1)
    # compact inferno-like ramp: black -> purple -> orange -> yellow
    r = np.clip(3.0 * v - 0.3, 0, 1)
    g = np.clip(2.2 * v - 1.0, 0, 1)
    b = np.clip(1.2 - 2.4 * np.abs(v - 0.35), 0, 1) * (1 - v * 0.6)
    img = (np.stack([r, g, b], -1) * 255).astype(np.uint8)
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def step_trajectory(step_dir: str | Path) -> dict:
    """Per-step diagnostics for the explorer: L2 distance to the final
    step, step-to-step delta, and k-means cluster assignment."""
    step_dir = Path(step_dir)
    files = sorted(step_dir.glob("step_*.npy"))
    feats = np.stack([np.load(f).reshape(-1) for f in files])
    final = feats[-1]
    dist = np.linalg.norm(feats - final, axis=1)
    delta = np.concatenate([[0.0], np.linalg.norm(np.diff(feats, axis=0),
                                                  axis=1)])
    k = min(6, len(files))
    assign, _ = _kmeans(feats, k)
    return {"dist_to_final": [float(x) for x in dist],
            "step_delta": [float(x) for x in delta],
            "cluster": [int(a) for a in assign]}


_PAGE = """<!doctype html><html><head><title>SingVisio (amphion_tpu)</title>
<style>
body{font-family:sans-serif;margin:1.5em;background:#16161e;color:#ddd}
button{margin:2px;background:#2a2a3a;color:#ddd;border:1px solid #555;
       padding:4px 10px;border-radius:4px;cursor:pointer}
button.active{background:#5a5aff}
img{image-rendering:pixelated;border:1px solid #444;margin:2px}
.thumb{cursor:pointer;height:90px}
#bigwrap{margin-top:.5em}
input[type=range]{width:640px}
canvas{background:#1e1e2a;border:1px solid #444}
.lbl{color:#9a9ab8;font-size:.85em}
</style></head><body><h2>SingVisio — diffusion step explorer</h2>
<div id=exps></div>
<div id=controls style="display:none">
 <p class=lbl>step <span id=stepno>0</span> / <span id=nsteps>0</span>
 (drag; diamonds on the chart are k-means key steps)</p>
 <input type=range id=slider min=0 max=0 value=0>
 <div id=bigwrap><img id=big></div>
 <p class=lbl>key steps (one per mel cluster) — click to jump</p>
 <div id=thumbs></div>
 <p class=lbl>denoising trajectory: distance to final mel (line), colored
 by cluster</p>
 <canvas id=traj width=720 height=140></canvas>
</div>
<script>
let UID=null, NST=0, KEYS=[], TRAJ=null;
fetch('/api/experiments').then(r=>r.json()).then(exps=>{
 const d=document.getElementById('exps');
 exps.forEach(e=>{const b=document.createElement('button');b.textContent=e;
  b.onclick=()=>load(e,b);d.appendChild(b);});});
function load(uid,btn){UID=uid;
 document.querySelectorAll('#exps button').forEach(b=>b.classList.remove('active'));
 if(btn)btn.classList.add('active');
 fetch('/api/steps?uid='+uid).then(r=>r.json()).then(info=>{
  NST=info.n_steps;KEYS=info.key_steps;
  document.getElementById('controls').style.display='block';
  document.getElementById('nsteps').textContent=NST-1;
  const s=document.getElementById('slider');s.max=NST-1;s.value=NST-1;
  s.oninput=()=>show(+s.value);
  const t=document.getElementById('thumbs');t.innerHTML='';
  KEYS.forEach(k=>{const im=document.createElement('img');
   im.src='/api/mel.png?uid='+uid+'&step='+k;im.className='thumb';
   im.title='step '+k;im.onclick=()=>{s.value=k;show(k);};t.appendChild(im);});
  fetch('/api/trajectory?uid='+uid).then(r=>r.json()).then(tr=>{TRAJ=tr;drawTraj();});
  show(NST-1);});}
function show(step){document.getElementById('stepno').textContent=step;
 document.getElementById('big').src='/api/mel.png?uid='+UID+'&step='+step;
 drawTraj(step);}
const PAL=['#ff6b6b','#ffd93d','#6bcb77','#4d96ff','#c780fa','#f08a5d'];
function drawTraj(cur){if(!TRAJ)return;
 const c=document.getElementById('traj'),ctx=c.getContext('2d');
 ctx.clearRect(0,0,c.width,c.height);
 const d=TRAJ.dist_to_final,n=d.length,hi=Math.max(...d)||1;
 const X=i=>10+(c.width-20)*i/Math.max(n-1,1),
       Y=v=>c.height-12-(c.height-24)*v/hi;
 for(let i=1;i<n;i++){ctx.strokeStyle=PAL[TRAJ.cluster[i]%PAL.length];
  ctx.beginPath();ctx.moveTo(X(i-1),Y(d[i-1]));ctx.lineTo(X(i),Y(d[i]));ctx.stroke();}
 KEYS.forEach(k=>{ctx.fillStyle='#fff';ctx.beginPath();
  ctx.moveTo(X(k),Y(d[k])-5);ctx.lineTo(X(k)+4,Y(d[k]));
  ctx.lineTo(X(k),Y(d[k])+5);ctx.lineTo(X(k)-4,Y(d[k]));ctx.fill();});
 if(cur!=null){ctx.strokeStyle='#8888ff';ctx.beginPath();
  ctx.moveTo(X(cur),8);ctx.lineTo(X(cur),c.height-8);ctx.stroke();}}
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
        elif url.path == "/api/mel.png":
            m = np.load(self.root / q["uid"] / f"step_{int(q['step']):04d}.npy")
            body = mel_to_png(m)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif url.path == "/api/trajectory":
            self._json(step_trajectory(self.root / q["uid"]))
        else:
            self._json({"error": "not found"}, 404)


def serve(artifact_dir: str | Path, port: int = 8868):
    """Serve the step explorer over the dumped artifacts."""
    _Handler.root = Path(artifact_dir)
    httpd = HTTPServer(("127.0.0.1", port), _Handler)
    print(f"SingVisio explorer at http://127.0.0.1:{port}")
    httpd.serve_forever()
