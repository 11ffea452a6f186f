"""Thin live viewer: single-file web waterfall + tuning surface.

The reference's core interactive loop — watch the pan-adaptor waterfall,
click to tune, switch modes (reference gui.py:1222-1398 UpdatePSD,
1769-1896 MouseClickRF, 1900-2038 FreqSelect) — reproduced headlessly:
a stdlib HTTP server streams DisplayEngine frames as JSON to an embedded
HTML/canvas page at ~5 Hz, and clicks post pure params swaps back through
`executive.post` (block-boundary mutation, zero recompiles). No Qt, no
dependencies, one open port.

    python -m pysdr_tpu ... --psd --web 8080    # then open localhost:8080
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from pysdr_tpu import tables

PAGE = """<!DOCTYPE html>
<html><head><title>pysdr_tpu</title><style>
 body{background:#111;color:#ddd;font:13px monospace;margin:14px}
 canvas{display:block;margin:4px 0;image-rendering:pixelated}
 #bar{margin:6px 0} select,button{background:#222;color:#ddd;border:1px solid #555}
 #freq{color:#8cf;font-size:18px}
</style></head><body>
<div id="bar"><span id="freq">--</span> Hz
 <select id="mode"></select>
 <span id="peaks"></span></div>
<canvas id="psd" width="1024" height="120"></canvas>
<canvas id="wf" width="1024" height="240"></canvas>
<div>click waterfall/PSD to tune &middot; RX0</div>
<script>
const wf=document.getElementById('wf'),psd=document.getElementById('psd');
const wctx=wf.getContext('2d'),pctx=psd.getContext('2d');
const modeSel=document.getElementById('mode');
let f0=0,f1=1,modes=[];
function lut(v){ // viridis-ish
 const t=v/255;return [Math.floor(255*(0.267+t*(0.993-0.267))),
  Math.floor(255*(0.005+t*(0.906-0.005))),Math.floor(255*(0.329+(t<0.5?t*0.44:0.551-(t-0.5)*0.81)))];}
async function tick(){
 try{
  const r=await fetch('frame.json');const d=await r.json();
  if(!d.ok){setTimeout(tick,400);return}
  f0=d.f0;f1=d.f1;
  document.getElementById('freq').textContent=d.fc.toFixed(0);
  if(modes.length==0&&d.modes){modes=d.modes;
   for(const m of modes){const o=document.createElement('option');o.text=m;modeSel.add(o);}
   modeSel.value=d.mode;
   modeSel.onchange=()=>fetch('mode?m='+modeSel.value);}
  else if(document.activeElement!==modeSel){modeSel.value=d.mode;}
  document.getElementById('peaks').textContent=
    d.peaks.map(p=>p.toFixed(0)).join(' ');
  const rows=d.wf.length,cols=d.wf[0].length;
  if(wf.width!=cols){wf.width=cols;psd.width=cols;}
  const img=wctx.createImageData(cols,rows);
  for(let y=0;y<rows;y++)for(let x=0;x<cols;x++){
   const c=lut(d.wf[y][x]),i=4*(y*cols+x);
   img.data[i]=c[0];img.data[i+1]=c[1];img.data[i+2]=c[2];img.data[i+3]=255;}
  wctx.putImageData(img,0,0);
  pctx.fillStyle='#111';pctx.fillRect(0,0,psd.width,psd.height);
  pctx.strokeStyle='#8cf';pctx.beginPath();
  const lo=Math.min(...d.psd),hi=Math.max(...d.psd)+1e-6;
  for(let x=0;x<cols;x++){const y=psd.height-1-(d.psd[x]-lo)/(hi-lo)*(psd.height-2);
   x?pctx.lineTo(x,y):pctx.moveTo(x,y);}
  pctx.stroke();
 }catch(e){}
 setTimeout(tick,200);}
function clickTune(ev,el){const r=el.getBoundingClientRect();
 const f=f0+(ev.clientX-r.left)/r.width*(f1-f0);
 fetch('tune?f='+f.toFixed(0));}
wf.onclick=e=>clickTune(e,wf);psd.onclick=e=>clickTune(e,psd);
tick();
</script></body></html>
"""


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):   # silent
        pass

    def _send(self, body: bytes, ctype: str):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        view: WebViewer = self.server.view  # type: ignore
        url = urlparse(self.path)
        q = parse_qs(url.query)
        if url.path in ("/", "/index.html"):
            return self._send(PAGE.encode(), "text/html")
        if url.path == "/frame.json":
            return self._send(json.dumps(view.frame_json()).encode(),
                              "application/json")
        if url.path == "/tune":
            view.tune(float(q["f"][0]), int(q.get("rx", ["0"])[0]))
            return self._send(b"ok", "text/plain")
        if url.path == "/mode":
            view.set_mode(q["m"][0], int(q.get("rx", ["0"])[0]))
            return self._send(b"ok", "text/plain")
        self.send_error(404)


class WebViewer:
    """Bridges (DisplayEngine, Executive) to the browser."""

    def __init__(self, display, executive, port: int = 8080,
                 host: str = "127.0.0.1"):
        self.display = display
        self.ex = executive
        self.server = ThreadingHTTPServer((host, port), _Handler)
        self.server.daemon_threads = True
        self.server.view = self  # type: ignore
        self.port = self.server.server_address[1]
        self._thread = None

    # --- data plane ---

    def frame_json(self) -> dict:
        fr = self.display.frames.get("RF")
        bank = self.ex.bank
        if hasattr(bank, "_rx_cfgs"):
            cfg0 = bank._rx_cfgs[0]
            fc = cfg0.fc_hz
        else:                       # ChannelizerBank
            cfg0 = bank._ch_cfgs[0]
            fc = bank.cfg.fc_hz
        if fr is None:
            return {"ok": False}
        wf = fr.waterfall_u8
        # decimate columns for the wire (<=1024)
        step = max(1, wf.shape[1] // 1024)
        return {
            "ok": True,
            "fc": fc,
            "mode": tables.MODE_NAMES[cfg0.mode],
            "modes": list(tables.MODE_NAMES.values()),
            "f0": float(fr.freqs_hz[0]),
            "f1": float(fr.freqs_hz[-1]),
            "psd": np.asarray(fr.psd_db[::step], np.float64).round(1)
                     .tolist(),
            "wf": wf[:, ::step].tolist(),
            "peaks": np.asarray(fr.peak_freqs_hz, np.float64).tolist(),
        }

    # --- control plane (FreqSelect / ModeSelect equivalents) ---

    def tune(self, freq_hz: float, rx: int = 0):
        # snap to a bandmap spot when close (reference click snapping,
        # gui.py:1797-1830)
        spot = self.display.rf.spots.snap(freq_hz, max_dist_hz=2e3)
        if spot is not None:
            freq_hz = spot.freq_hz
        self.ex.post("retune", rx, freq_hz)
        if rx == 0:
            self.display.retune(freq_hz)

    def set_mode(self, name: str, rx: int = 0):
        self.ex.post("set_mode", rx, tables.mode_from_name(name))

    # --- lifecycle ---

    def start(self):
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.server.shutdown()
        self.server.server_close()
