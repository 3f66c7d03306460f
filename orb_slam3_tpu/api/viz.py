"""Offline map/trajectory visualization exports — the viewer substitute.

Role of the Pangolin viewer stack (`/root/reference/src/{Viewer,MapDrawer,
FrameDrawer}.cc`) re-imagined for a headless TPU pod: instead of a live GL
window, export the Atlas as standard artifacts any point-cloud viewer or
notebook can open:

- `save_map_ply`: landmarks (colored by map id) + keyframe positions as a
  PLY point cloud (MapDrawer::DrawMapPoints/DrawKeyFrames role)
- `save_topdown_png`: orthographic top-down rendering of landmarks,
  keyframes, covisibility edges, and the frame trajectory (the map view)
- `save_tracking_overlay`: current-frame keypoints/matches drawn on the
  image (FrameDrawer::DrawFrame role)
"""

from __future__ import annotations

import numpy as np

from ..atlas import state as atlas_state


_MAP_COLORS = np.array(
    [[66, 135, 245], [240, 101, 67], [60, 180, 75], [255, 195, 0],
     [145, 30, 180], [70, 240, 240]], np.uint8
)


def save_map_ply(path: str, s: atlas_state.MapState) -> None:
    lm = np.array(s.lm_valid)
    X = np.array(s.lm_pos)[lm]
    mid = np.array(s.lm_map_id)[lm] % len(_MAP_COLORS)
    kv = np.array(s.kf_valid)
    kR = np.array(s.kf_R)[kv]
    kt = np.array(s.kf_t)[kv]
    centers = -np.einsum("nij,ni->nj", kR, kt)

    n = len(X) + len(centers)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for x, m in zip(X, mid):
            c = _MAP_COLORS[m]
            f.write(f"{x[0]:.4f} {x[1]:.4f} {x[2]:.4f} {c[0]} {c[1]} {c[2]}\n")
        for c_ in centers:
            f.write(f"{c_[0]:.4f} {c_[1]:.4f} {c_[2]:.4f} 255 0 0\n")


def save_topdown_png(path: str, s: atlas_state.MapState,
                     trajectory=None, size: int = 900,
                     axes=(0, 2)) -> None:
    """Orthographic projection onto the (axes) plane (default x-z, the
    'top view' of a forward-z camera world)."""
    import cv2

    img = np.full((size, size, 3), 20, np.uint8)
    lm = np.array(s.lm_valid)
    X = np.array(s.lm_pos)[lm][:, axes]
    kv = np.array(s.kf_valid)
    centers = -np.einsum(
        "nij,ni->nj", np.array(s.kf_R)[kv], np.array(s.kf_t)[kv]
    )[:, axes]
    pts = [X] if len(X) else []
    if len(centers):
        pts.append(centers)
    if trajectory is not None and len(trajectory):
        pts.append(np.asarray(trajectory)[:, axes])
    if not pts:
        cv2.imwrite(path, img)
        return
    allp = np.concatenate(pts)
    lo = allp.min(axis=0) - 0.2
    hi = allp.max(axis=0) + 0.2
    scale = (size - 40) / max(float((hi - lo).max()), 1e-6)

    def to_px(p):
        q = ((p - lo) * scale + 20).astype(int)
        return np.clip(q, 0, size - 1)

    mid = np.array(s.lm_map_id)[lm] % len(_MAP_COLORS)
    for p, m in zip(to_px(X), mid):
        img[p[1], p[0]] = _MAP_COLORS[m][::-1]
    if trajectory is not None and len(trajectory) > 1:
        t = to_px(np.asarray(trajectory)[:, axes])
        for a, b in zip(t[:-1], t[1:]):
            cv2.line(img, tuple(a), tuple(b), (80, 220, 80), 1)
    for p in to_px(centers):
        cv2.circle(img, tuple(p), 3, (0, 0, 255), -1)
    cv2.imwrite(path, img)


def save_tracking_overlay(path: str, img_gray, feats, matched_mask=None) -> None:
    """Draw keypoints on the frame (green = matched to a landmark)."""
    import cv2

    img = cv2.cvtColor(
        np.clip(np.asarray(img_gray), 0, 255).astype(np.uint8),
        cv2.COLOR_GRAY2BGR,
    )
    xy = np.array(feats.xy)
    valid = np.array(feats.valid)
    matched = (
        np.array(matched_mask) if matched_mask is not None
        else np.zeros(len(xy), bool)
    )
    for i in range(len(xy)):
        if not valid[i]:
            continue
        p = tuple(xy[i].astype(int))
        color = (0, 255, 0) if matched[i] else (120, 120, 120)
        cv2.circle(img, p, 2, color, -1)
    cv2.imwrite(path, img)


def map_3d_payload(s: atlas_state.MapState, trajectory=None,
                   max_points: int = 40000) -> dict:
    """JSON-serializable scene for the interactive 3D viewer: landmarks
    (colored per map id), keyframe poses (for frusta), spanning-tree edges,
    and the frame trajectory. MapDrawer::DrawMapPoints/DrawKeyFrames/
    DrawCurrentCamera data contract (/root/reference/src/MapDrawer.cc:
    135-447) as data instead of GL calls."""
    lm = np.array(s.lm_valid)
    X = np.array(s.lm_pos)[lm]
    mid = (np.array(s.lm_map_id)[lm] % len(_MAP_COLORS)).astype(int)
    if len(X) > max_points:
        sel = np.random.default_rng(0).choice(len(X), max_points,
                                              replace=False)
        X, mid = X[sel], mid[sel]
    kv = np.array(s.kf_valid)
    rows = np.flatnonzero(kv)
    kR = np.array(s.kf_R)[rows]
    kt = np.array(s.kf_t)[rows]
    centers = -np.einsum("nij,ni->nj", kR, kt)
    # camera->world rotations give the frustum orientation
    Rwc = np.transpose(kR, (0, 2, 1))
    parent = np.array(s.kf_parent)[rows]
    row_pos = {int(r): i for i, r in enumerate(rows)}
    edges = [[row_pos[int(r)], row_pos[int(p)]]
             for r, p in zip(rows, parent)
             if int(p) in row_pos and int(p) != int(r)]
    traj = (np.asarray(trajectory, np.float32).tolist()
            if trajectory is not None and len(trajectory) else [])
    return dict(
        points=np.round(X.astype(float), 4).tolist(),
        colors=mid.tolist(),
        palette=_MAP_COLORS.tolist(),
        kf_centers=np.round(centers.astype(float), 4).tolist(),
        kf_rot=np.round(Rwc.astype(float), 4).tolist(),
        edges=edges,
        trajectory=traj,
    )


_VIEWER3D_HTML = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>orb_slam3_tpu map</title>
<style>
 body{margin:0;background:#101014;color:#ccc;font:12px monospace;overflow:hidden}
 #hud{position:fixed;left:8px;top:8px;user-select:none}
 canvas{display:block}
</style></head><body>
<div id="hud">drag: orbit &middot; shift-drag/right-drag: pan &middot;
 wheel: zoom &middot; t: trajectory &middot; f: frusta &middot; e: edges</div>
<canvas id="c"></canvas>
<script id="scene" type="application/json">__SCENE_JSON__</script>
<script>
"use strict";
const S = JSON.parse(document.getElementById("scene").textContent);
const cv = document.getElementById("c"), cx = cv.getContext("2d");
let W, H; function rs(){W=cv.width=innerWidth;H=cv.height=innerHeight;draw();}
addEventListener("resize", rs);
// center/scale the scene
const pts = S.points, n = pts.length;
let c0=[0,0,0];
for (const p of pts){c0[0]+=p[0];c0[1]+=p[1];c0[2]+=p[2];}
if(n){c0=c0.map(v=>v/n);}
let rad=1e-6;
for (const p of pts){const d=Math.hypot(p[0]-c0[0],p[1]-c0[1],p[2]-c0[2]); if(d>rad)rad=d;}
let yaw=0.6, pitch=0.4, dist=rad*2.5, panX=0, panY=0;
let showT=true, showF=true, showE=true;
function cam(){
  const cy=Math.cos(yaw), sy=Math.sin(yaw), cp=Math.cos(pitch), sp=Math.sin(pitch);
  // rows of R (world->cam)
  return [[cy,0,-sy],[sy*sp,cp,cy*sp],[sy*cp,-sp,cy*cp]];
}
function proj(p, R){
  const x=p[0]-c0[0], y=p[1]-c0[1], z=p[2]-c0[2];
  const X=R[0][0]*x+R[0][1]*y+R[0][2]*z + panX;
  const Y=R[1][0]*x+R[1][1]*y+R[1][2]*z + panY;
  const Z=R[2][0]*x+R[2][1]*y+R[2][2]*z + dist;
  if (Z<=rad*0.01) return null;
  const f=0.9*Math.min(W,H);
  return [W/2+f*X/Z, H/2+f*Y/Z, Z];
}
function draw(){
  cx.fillStyle="#101014"; cx.fillRect(0,0,W,H);
  const R=cam();
  const pal=S.palette;
  for(let i=0;i<n;i++){
    const q=proj(pts[i],R); if(!q) continue;
    const c=pal[S.colors[i]];
    cx.fillStyle=`rgb(${c[0]},${c[1]},${c[2]})`;
    const s=Math.max(1, 2.2*rad/q[2]);
    cx.fillRect(q[0],q[1],s,s);
  }
  if(showT && S.trajectory.length>1){
    cx.strokeStyle="#50dc78"; cx.beginPath(); let started=false;
    for(const p of S.trajectory){const q=proj(p,R); if(!q){started=false;continue;}
      if(!started){cx.moveTo(q[0],q[1]);started=true;} else cx.lineTo(q[0],q[1]);}
    cx.stroke();
  }
  const C=S.kf_centers, Rw=S.kf_rot;
  if(showE){
    cx.strokeStyle="#3c64c8"; cx.beginPath();
    for(const e of S.edges){const a=proj(C[e[0]],R), b=proj(C[e[1]],R);
      if(a&&b){cx.moveTo(a[0],a[1]);cx.lineTo(b[0],b[1]);}}
    cx.stroke();
  }
  if(showF){
    const s=rad*0.03;
    cx.strokeStyle="#ff5050";
    for(let k=0;k<C.length;k++){
      const o=C[k], Q=Rw[k];
      const loc=[[0,0,0],[-s,-s*0.7,s*1.6],[s,-s*0.7,s*1.6],[s,s*0.7,s*1.6],[-s,s*0.7,s*1.6]];
      const w=loc.map(v=>[o[0]+Q[0][0]*v[0]+Q[0][1]*v[1]+Q[0][2]*v[2],
                          o[1]+Q[1][0]*v[0]+Q[1][1]*v[1]+Q[1][2]*v[2],
                          o[2]+Q[2][0]*v[0]+Q[2][1]*v[1]+Q[2][2]*v[2]]);
      const q=w.map(p=>proj(p,R));
      if(q.some(x=>!x)) continue;
      cx.beginPath();
      for(const [a,b] of [[0,1],[0,2],[0,3],[0,4],[1,2],[2,3],[3,4],[4,1]]){
        cx.moveTo(q[a][0],q[a][1]); cx.lineTo(q[b][0],q[b][1]);}
      cx.stroke();
    }
  }
}
let drag=null;
cv.addEventListener("mousedown",e=>{drag=[e.clientX,e.clientY,e.shiftKey||e.button===2];});
addEventListener("mouseup",()=>drag=null);
addEventListener("mousemove",e=>{
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(drag[2]){panX+=dx*dist/(0.9*Math.min(W,H));panY+=dy*dist/(0.9*Math.min(W,H));}
  else {yaw+=dx*0.008; pitch+=dy*0.008;}
  drag=[e.clientX,e.clientY,drag[2]]; draw();
});
cv.addEventListener("wheel",e=>{dist*=Math.exp(e.deltaY*0.001);draw();e.preventDefault();});
cv.addEventListener("contextmenu",e=>e.preventDefault());
addEventListener("keydown",e=>{
  if(e.key==="t")showT=!showT; if(e.key==="f")showF=!showF;
  if(e.key==="e")showE=!showE; draw();});
rs();
</script></body></html>
"""


def render_map_html(s: atlas_state.MapState, trajectory=None) -> str:
    """Interactive 3D map viewer as ONE self-contained HTML string
    (vanilla-JS canvas renderer, no external assets — works offline on a
    headless pod). Landmarks, keyframe frusta, spanning-tree edges, and
    the frame trajectory with orbit/pan/zoom controls — the MapDrawer/
    Viewer interaction surface (/root/reference/src/MapDrawer.cc:135-447,
    Viewer.cc:180-370) re-imagined for the browser."""
    import json as _json

    payload = map_3d_payload(s, trajectory)
    return _VIEWER3D_HTML.replace("__SCENE_JSON__", _json.dumps(payload))


def save_map_html(path: str, s: atlas_state.MapState, trajectory=None) -> None:
    with open(path, "w") as f:
        f.write(render_map_html(s, trajectory))
