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


def mel_mcd(m1: np.ndarray, m2: np.ndarray, n_coef: int = 13) -> float:
    """Mel-cepstral distortion (dB) between two (n_mel, T) log-mels:
    DCT-II cepstra per frame, c1..n_coef, the standard
    (10/ln10)·sqrt(2·Σ Δc²) averaged over frames — the per-step quality
    curve of the reference's metric view (SingVisio `function.js` metric
    panel)."""
    def cepstra(m):
        m = np.asarray(m, np.float64)
        if m.ndim == 3:
            m = m[0]
        n = m.shape[0]
        k = np.arange(n)
        basis = np.cos(np.pi * (k[:, None] + 0.5) * np.arange(n)[None] / n)
        return (m.T @ basis)[:, 1: n_coef + 1]  # (T, n_coef), drop c0

    c1, c2 = cepstra(m1), cepstra(m2)
    t = min(len(c1), len(c2))
    d = c1[:t] - c2[:t]
    return float((10.0 / np.log(10.0))
                 * np.mean(np.sqrt(2.0 * (d * d).sum(axis=1))))


def step_metrics(step_dir: str | Path) -> dict:
    """Per-step MCD to the final step (the denoising quality curve)."""
    step_dir = Path(step_dir)
    files = sorted(step_dir.glob("step_*.npy"))
    final = np.load(files[-1])
    return {"mcd_to_final": [mel_mcd(np.load(f), final) for f in files]}


_F0_CACHE: dict = {}


def step_f0(step_dir: str | Path, step: int, sample_rate: int = 24000,
            hop_size: int = 120) -> list[float]:
    """F0 contour of one denoising step: mel → pseudo-inverse mel →
    Griffin-Lim phase recovery → native YIN. Fully checkpoint-free (no
    vocoder needed), so the pitch view works on any dumped run; the
    reference's pitch panel runs a vocoder + pyworld instead."""
    key = (str(step_dir), int(step))
    if key in _F0_CACHE:
        return _F0_CACHE[key]
    import jax.numpy as jnp

    from amphion_tpu.ops.dsp import griffin_lim
    from amphion_tpu.ops.f0 import F0Config, yin_f0
    from amphion_tpu.ops.mel import MelConfig, mel_filterbank

    m = np.load(Path(step_dir) / f"step_{int(step):04d}.npy")
    if m.ndim == 3:
        m = m[0]
    n_mel, t = m.shape
    mc = MelConfig(sample_rate=sample_rate, n_mel=n_mel, hop_size=hop_size)
    fb = mel_filterbank(mc.sample_rate, mc.n_fft, mc.n_mel, mc.fmin, mc.fmax)
    # log-mel → linear magnitude via regularized pseudo-inverse
    pinv = np.linalg.pinv(fb, rcond=1e-4)  # (F, n_mel)
    mag = np.maximum(pinv @ np.exp(np.asarray(m, np.float64)), 0.0)
    wav = np.asarray(griffin_lim(
        jnp.asarray(mag, jnp.float32)[None], mc.n_fft, mc.hop_size,
        mc.win_size, n_iters=24))[0]
    fc = F0Config(sample_rate=sample_rate, hop_size=hop_size)
    n = len(wav) // fc.hop_size * fc.hop_size
    f0, _ = yin_f0(jnp.asarray(wav[:n])[None], fc)
    out = [float(v) for v in np.asarray(f0)[0]]
    _F0_CACHE[key] = out
    return out


def diff_to_png(ma: np.ndarray, mb: np.ndarray, zoom: int = 3) -> bytes:
    """Signed difference of two mels as a blue-white-red PNG (the
    reference's step-pair difference view)."""
    import struct
    import zlib

    ma, mb = np.asarray(ma, np.float32), np.asarray(mb, np.float32)
    if ma.ndim == 3:
        ma = ma[0]
    if mb.ndim == 3:
        mb = mb[0]
    t = min(ma.shape[1], mb.shape[1])
    d = (ma[:, :t] - mb[:, :t])[::-1]
    s = max(float(np.abs(d).max()), 1e-9)
    v = d / s  # [-1, 1]
    v = np.repeat(np.repeat(v, zoom, axis=0), zoom, axis=1)
    r = np.clip(1.0 + np.minimum(v, 0.0), 0, 1)  # blue side dims red
    g = 1.0 - np.abs(v)
    b = np.clip(1.0 - np.maximum(v, 0.0), 0, 1)
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


def step_projection(step_dir: str | Path) -> dict:
    """The reference app's *touch map* (`webpage/resources/function.js`
    touch_map): a 2-D projection of the per-step latents/mels across the
    diffusion trajectory, clickable to select steps. PCA via SVD on the
    centered flattened mels; points carry the step index and the k-means
    cluster used by the key-step picker."""
    step_dir = Path(step_dir)
    files = sorted(step_dir.glob("step_*.npy"))
    feats = np.stack([np.load(f).reshape(-1) for f in files])
    mu = feats.mean(axis=0, keepdims=True)
    x = feats - mu
    # economy SVD on (n_steps, D): n_steps is small, D large → run SVD on
    # the (n, n) gram for stability/speed
    g = x @ x.T
    w, v = np.linalg.eigh(g)
    order = np.argsort(w)[::-1]
    w, v = np.maximum(w[order], 0.0), v[:, order]
    xy = v[:, :2] * np.sqrt(w[:2])[None, :]
    tot = float(w.sum()) or 1.0
    k = min(6, len(files))
    assign, _ = _kmeans(feats, k)
    return {
        "x": [float(a) for a in xy[:, 0]],
        "y": [float(a) for a in xy[:, 1]],
        "step": list(range(len(files))),
        "cluster": [int(a) for a in assign],
        "var_explained": [float(w[0] / tot), float(w[1] / tot)
                          ] if len(w) >= 2 else [1.0, 0.0],
    }


def metric_histogram(step_dir: str | Path, metric: str = "mcd_to_final",
                     bins: int = 16) -> dict:
    """The reference app's metric histogram view: distribution of a
    per-step metric over the trajectory."""
    if metric == "mcd_to_final":
        vals = np.asarray(step_metrics(step_dir)["mcd_to_final"])
    else:
        tr = step_trajectory(step_dir)
        if metric not in tr:
            raise KeyError(metric)
        vals = np.asarray(tr[metric])
    counts, edges = np.histogram(vals, bins=bins)
    return {"metric": metric,
            "edges": [float(e) for e in edges],
            "counts": [int(c) for c in counts],
            "mean": float(vals.mean()), "min": float(vals.min()),
            "max": float(vals.max())}


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
.row{display:flex;gap:10px;align-items:flex-start}
.col{flex:0 0 auto}
select{background:#2a2a3a;color:#ddd;border:1px solid #555;padding:3px}
.overlay{position:relative;display:inline-block}
.overlay canvas{position:absolute;left:0;top:0;background:transparent;
 border:none;pointer-events:none}
#tourbox{position:fixed;z-index:9;background:#2a2a4a;border:2px solid #5a5aff;
 border-radius:8px;padding:12px;max-width:340px;box-shadow:0 4px 24px #000}
.hl{outline:3px solid #5a5aff;outline-offset:3px}
</style></head><body><h2>SingVisio — diffusion step explorer
 <button id=tourbtn style="float:right">guided tour</button></h2>
<div id=exps></div>
<div id=controls style="display:none">
 <p class=lbl>compare with:
  <select id=bsel><option value="">(none)</option></select>
  &nbsp; overlays: <label><input type=checkbox id=f0chk> F0 contour
  (native YIN on the Griffin-Lim-vocoded step)</label></p>
 <p class=lbl>step <span id=stepno>0</span> / <span id=nsteps>0</span>
 (drag; diamonds on the chart are k-means key steps)</p>
 <input type=range id=slider min=0 max=0 value=0>
 <div id=bigwrap class=row>
  <div class=col><p class=lbl id=lblA>A</p>
   <div class=overlay><img id=big><canvas id=f0A></canvas></div></div>
  <div class=col id=bwrap style="display:none"><p class=lbl id=lblB>B</p>
   <div class=overlay><img id=bigB><canvas id=f0B></canvas></div></div>
  <div class=col id=dwrap style="display:none">
   <p class=lbl>A − B difference (red = A louder)</p><img id=bigD></div>
 </div>
 <p class=lbl>key steps (one per mel cluster) — click to jump</p>
 <div id=thumbs></div>
 <div class=row>
  <div class=col>
   <p class=lbl>denoising trajectory: distance to final mel (line),
   colored by cluster</p>
   <canvas id=traj width=720 height=140></canvas></div>
  <div class=col>
   <p class=lbl>quality vs step: MCD to final (dB) — A solid, B dashed</p>
   <canvas id=mcd width=520 height=140></canvas></div>
 </div>
 <div class=row>
  <div class=col>
   <p class=lbl>projection map (PCA of step mels — click a point to jump;
   diamond = current step)</p>
   <canvas id=proj width=420 height=300></canvas></div>
  <div class=col>
   <p class=lbl>metric histogram:
    <select id=hsel><option>mcd_to_final</option>
     <option>dist_to_final</option><option>step_delta</option></select>
   </p>
   <canvas id=hist width=420 height=300></canvas></div>
 </div>
</div>
<script>
let UID=null,UIDB=null,NST=0,KEYS=[],TRAJ=null,MCD=null,MCDB=null,PROJ=null;
let ALLEXPS=[];
function expParts(e){const p=e.split('__');
 return p.length>=3?{model:p[0],dataset:p[1],uid:e}
  :(p.length==2?{model:p[0],dataset:'-',uid:e}
    :{model:'-',dataset:'-',uid:e});}
function renderExps(){
 const d=document.getElementById('exps');d.innerHTML='';
 const ms=document.getElementById('msel'),ds=document.getElementById('dsel');
 const fm=ms?ms.value:'',fd=ds?ds.value:'';
 const bs=document.getElementById('bsel');bs.innerHTML='<option value="">(none)</option>';
 ALLEXPS.forEach(e=>{const p=expParts(e);
  if(fm&&fm!='(all)'&&p.model!=fm)return;
  if(fd&&fd!='(all)'&&p.dataset!=fd)return;
  const b=document.createElement('button');b.textContent=e;
  b.onclick=()=>load(e,b);d.appendChild(b);
  const o=document.createElement('option');o.value=e;o.textContent=e;
  bs.appendChild(o);});}
fetch('/api/experiments').then(r=>r.json()).then(exps=>{
 ALLEXPS=exps;
 // multi-run mode: model/dataset dropdowns from model__dataset__uid names
 const models=[...new Set(exps.map(e=>expParts(e).model))],
       dsets=[...new Set(exps.map(e=>expParts(e).dataset))];
 if(models.length>1||dsets.length>1){
  const bar=document.createElement('p');bar.className='lbl';
  bar.innerHTML='model: <select id=msel></select> dataset: '+
   '<select id=dsel></select>';
  document.getElementById('exps').before(bar);
  const ms=document.getElementById('msel'),ds=document.getElementById('dsel');
  ['(all)',...models].forEach(m=>{const o=document.createElement('option');
   o.textContent=m;ms.appendChild(o);});
  ['(all)',...dsets].forEach(m=>{const o=document.createElement('option');
   o.textContent=m;ds.appendChild(o);});
  ms.onchange=renderExps;ds.onchange=renderExps;}
 renderExps();
 const bs=document.getElementById('bsel');
 bs.onchange=()=>{UIDB=bs.value||null;MCDB=null;
  if(UIDB)fetch('/api/metrics?uid='+UIDB).then(r=>r.json())
    .then(m=>{MCDB=m.mcd_to_final;drawMcd();});
  refresh();};});
function load(uid,btn){UID=uid;
 document.querySelectorAll('#exps button').forEach(b=>b.classList.remove('active'));
 if(btn)btn.classList.add('active');
 fetch('/api/steps?uid='+uid).then(r=>r.json()).then(info=>{
  NST=info.n_steps;KEYS=info.key_steps;
  document.getElementById('controls').style.display='block';
  document.getElementById('nsteps').textContent=NST-1;
  const s=document.getElementById('slider');s.max=NST-1;s.value=NST-1;
  s.oninput=()=>refresh();
  const t=document.getElementById('thumbs');t.innerHTML='';
  KEYS.forEach(k=>{const im=document.createElement('img');
   im.src='/api/mel.png?uid='+uid+'&step='+k;im.className='thumb';
   im.title='step '+k;im.onclick=()=>{s.value=k;refresh();};t.appendChild(im);});
  fetch('/api/trajectory?uid='+uid).then(r=>r.json()).then(tr=>{TRAJ=tr;drawTraj();});
  fetch('/api/metrics?uid='+uid).then(r=>r.json()).then(m=>{MCD=m.mcd_to_final;drawMcd();});
  fetch('/api/projection?uid='+uid).then(r=>r.json()).then(p=>{PROJ=p;drawProj();});
  drawHist();
  refresh();});}
document.getElementById('hsel').onchange=()=>drawHist();
function projXY(c){const xs=PROJ.x,ys=PROJ.y;
 const x0=Math.min(...xs),x1=Math.max(...xs),
       y0=Math.min(...ys),y1=Math.max(...ys);
 return i=>[14+(c.width-28)*(xs[i]-x0)/Math.max(x1-x0,1e-9),
            c.height-14-(c.height-28)*(ys[i]-y0)/Math.max(y1-y0,1e-9)];}
function drawProj(cur){if(!PROJ)return;
 const c=document.getElementById('proj'),ctx=c.getContext('2d');
 ctx.clearRect(0,0,c.width,c.height);
 const XY=projXY(c),n=PROJ.x.length;
 ctx.strokeStyle='#444';ctx.beginPath();
 for(let i=0;i<n;i++){const[x,y]=XY(i);i?ctx.lineTo(x,y):ctx.moveTo(x,y);}
 ctx.stroke();
 for(let i=0;i<n;i++){const[x,y]=XY(i);
  ctx.fillStyle=PAL[PROJ.cluster[i]%PAL.length];
  ctx.beginPath();ctx.arc(x,y,4,0,7);ctx.fill();}
 if(cur!=null){const[x,y]=XY(cur);ctx.strokeStyle='#fff';ctx.lineWidth=2;
  ctx.beginPath();ctx.moveTo(x,y-8);ctx.lineTo(x+8,y);ctx.lineTo(x,y+8);
  ctx.lineTo(x-8,y);ctx.closePath();ctx.stroke();ctx.lineWidth=1;}
 c.onclick=ev=>{const r=c.getBoundingClientRect(),
   mx=ev.clientX-r.left,my=ev.clientY-r.top;let best=0,bd=1e18;
  for(let i=0;i<n;i++){const[x,y]=XY(i),d=(x-mx)**2+(y-my)**2;
   if(d<bd){bd=d;best=i;}}
  document.getElementById('slider').value=PROJ.step[best];refresh();};}
function drawHist(){if(!UID)return;
 const metric=document.getElementById('hsel').value;
 fetch('/api/histogram?uid='+UID+'&metric='+metric).then(r=>r.json())
 .then(h=>{const c=document.getElementById('hist'),ctx=c.getContext('2d');
  ctx.clearRect(0,0,c.width,c.height);
  const n=h.counts.length,hi=Math.max(...h.counts,1);
  for(let i=0;i<n;i++){const x=12+(c.width-24)*i/n,
    w=(c.width-24)/n-2,ht=(c.height-40)*h.counts[i]/hi;
   ctx.fillStyle='#4d96ff';ctx.fillRect(x,c.height-24-ht,w,ht);}
  ctx.fillStyle='#9a9ab8';ctx.font='11px sans-serif';
  ctx.fillText(h.edges[0].toFixed(2),8,c.height-8);
  ctx.fillText(h.edges[n].toFixed(2),c.width-60,c.height-8);
  ctx.fillText(metric+'  mean '+h.mean.toFixed(2),12,14);});}
// guided tour (the reference webpage ships an intro-js walkthrough;
// this is a dependency-free equivalent stepping through every view)
const TOUR=[['#exps','Pick an experiment. With model__dataset__uid '+
  'naming the model/dataset dropdowns filter runs (multi-run mode).'],
 ['#slider','Drag through the denoising trajectory. The mel heatmap, '+
  'overlays and every chart track the selected step.'],
 ['#thumbs','Key steps: one k-means representative per mel cluster — '+
  'click a thumbnail to jump.'],
 ['#bsel','Compare with a second run: side-by-side mels plus the A−B '+
  'difference heatmap.'],
 ['#traj','Denoising trajectory: L2 distance to the final mel, '+
  'colored by cluster; diamonds mark key steps.'],
 ['#mcd','Quality vs step: MCD to the final mel. A solid, B dashed.'],
 ['#proj','Projection map (touch map): 2-D PCA of the step mels. '+
  'Click any point to jump to that step.'],
 ['#hist','Metric histogram: distribution of the selected per-step '+
  'metric over the trajectory.']];
let tourI=-1;
function tourStep(di){
 document.querySelectorAll('.hl').forEach(e=>e.classList.remove('hl'));
 const old=document.getElementById('tourbox');if(old)old.remove();
 tourI+=di;
 if(tourI<0||tourI>=TOUR.length){tourI=-1;return;}
 const[sel,txt]=TOUR[tourI],el=document.querySelector(sel);
 if(!el){tourStep(di);return;}
 el.classList.add('hl');el.scrollIntoView({block:'center'});
 const r=el.getBoundingClientRect(),box=document.createElement('div');
 box.id='tourbox';
 box.style.left=Math.min(innerWidth-360,r.left)+'px';
 box.style.top=Math.min(innerHeight-140,r.bottom+10)+'px';
 box.innerHTML='<b>'+(tourI+1)+'/'+TOUR.length+'</b> '+txt+'<br>'+
  '<button onclick="tourStep(-1)">back</button> '+
  '<button onclick="tourStep(1)">next</button> '+
  '<button onclick="tourI=99;tourStep(1)">done</button>';
 document.body.appendChild(box);}
document.getElementById('tourbtn').onclick=()=>{tourI=-1;
 if(document.getElementById('controls').style.display=='none'&&ALLEXPS.length)
  load(ALLEXPS[0],document.querySelector('#exps button'));
 tourStep(1);};
document.getElementById('f0chk').onchange=()=>refresh();
function refresh(){const step=+document.getElementById('slider').value;
 document.getElementById('stepno').textContent=step;
 document.getElementById('lblA').textContent='A: '+UID+' @ '+step;
 const big=document.getElementById('big');
 big.src='/api/mel.png?uid='+UID+'&step='+step;
 const showB=!!UIDB;
 document.getElementById('bwrap').style.display=showB?'block':'none';
 document.getElementById('dwrap').style.display=showB?'block':'none';
 if(showB){document.getElementById('lblB').textContent='B: '+UIDB+' @ '+step;
  document.getElementById('bigB').src='/api/mel.png?uid='+UIDB+'&step='+step;
  document.getElementById('bigD').src='/api/diff.png?uid_a='+UID+
   '&uid_b='+UIDB+'&step_a='+step+'&step_b='+step;}
 drawTraj(step);drawMcd(step);drawProj(step);
 const want=document.getElementById('f0chk').checked;
 drawF0('f0A',want?UID:null,step,big);
 drawF0('f0B',(want&&showB)?UIDB:null,step,document.getElementById('bigB'));}
function drawF0(cid,uid,step,img){const c=document.getElementById(cid),
 ctx=c.getContext('2d');
 if(!uid){c.width=0;c.height=0;return;}
 fetch('/api/f0?uid='+uid+'&step='+step).then(r=>r.json()).then(d=>{
  const f0=d.f0,W=img.width||f0.length,H=img.height||240;
  c.width=W;c.height=H;ctx.clearRect(0,0,W,H);
  const hi=Math.max(...f0,1);ctx.strokeStyle='#00e5ff';ctx.lineWidth=2;
  ctx.beginPath();let pen=false;
  f0.forEach((v,i)=>{const x=W*i/f0.length,y=H-4-(H-8)*v/hi;
   if(v>0){if(pen)ctx.lineTo(x,y);else ctx.moveTo(x,y);pen=true;}
   else pen=false;});
  ctx.stroke();});}
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
function drawMcd(cur){if(!MCD)return;
 const c=document.getElementById('mcd'),ctx=c.getContext('2d');
 ctx.clearRect(0,0,c.width,c.height);
 const all=MCDB?MCD.concat(MCDB):MCD,hi=Math.max(...all)||1;
 const X=(i,n)=>10+(c.width-20)*i/Math.max(n-1,1),
       Y=v=>c.height-12-(c.height-24)*v/hi;
 ctx.strokeStyle='#6bcb77';ctx.setLineDash([]);ctx.beginPath();
 MCD.forEach((v,i)=>{i?ctx.lineTo(X(i,MCD.length),Y(v))
   :ctx.moveTo(X(0,MCD.length),Y(v));});ctx.stroke();
 if(MCDB){ctx.strokeStyle='#ffd93d';ctx.setLineDash([5,4]);ctx.beginPath();
  MCDB.forEach((v,i)=>{i?ctx.lineTo(X(i,MCDB.length),Y(v))
    :ctx.moveTo(X(0,MCDB.length),Y(v));});ctx.stroke();ctx.setLineDash([]);}
 if(cur!=null){ctx.strokeStyle='#8888ff';ctx.beginPath();
  ctx.moveTo(X(cur,MCD.length),8);ctx.lineTo(X(cur,MCD.length),c.height-8);
  ctx.stroke();}}
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
        elif url.path == "/api/projection":
            self._json(step_projection(self.root / q["uid"]))
        elif url.path == "/api/histogram":
            self._json(metric_histogram(
                self.root / q["uid"], q.get("metric", "mcd_to_final"),
                int(q.get("bins", 16))))
        elif url.path == "/api/metrics":
            self._json(step_metrics(self.root / q["uid"]))
        elif url.path == "/api/f0":
            self._json({"f0": step_f0(
                self.root / q["uid"], int(q["step"]),
                sample_rate=int(q.get("sr", 24000)),
                hop_size=int(q.get("hop", 120)))})
        elif url.path == "/api/diff.png":
            ma = np.load(self.root / q["uid_a"]
                         / f"step_{int(q['step_a']):04d}.npy")
            mb = np.load(self.root / q["uid_b"]
                         / f"step_{int(q['step_b']):04d}.npy")
            body = diff_to_png(ma, mb)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._json({"error": "not found"}, 404)


def serve(artifact_dir: str | Path, port: int = 8868):
    """Serve the step explorer over the dumped artifacts."""
    _Handler.root = Path(artifact_dir)
    httpd = HTTPServer(("127.0.0.1", port), _Handler)
    print(f"SingVisio explorer at http://127.0.0.1:{port}")
    httpd.serve_forever()
