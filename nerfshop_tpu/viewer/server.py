"""Minimal web viewer — the headless-first replacement for the reference's
imgui/GLFW shell (L7/P6/E17). The GUI there is load-bearing for the editing
workflow (growing_selection.cu:119-432 buttons, scribbles, gizmo); here the
same verbs are HTTP endpoints over the Testbed API and a single-page client
renders frames progressively (dynamic resolution) with orbit controls.

Endpoints:
  GET  /                 the single-page client
  POST /render           {camera: [3][4], width, height, spp?} → PNG
  POST /train            {n_steps?, batch_size?} → stats
  POST /edit/<verb>      cage-pipeline verbs: select_sphere, compute_proxy,
                         extract_cage, translate, apply, vanish, clear
  GET  /state            camera/stats/edit-stage JSON

Start:  python -m nerfshop_tpu.viewer --scene <path> [--snapshot s.ingp]
or      from nerfshop_tpu.viewer import serve; serve(testbed, port=8080)
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

_STATIC = Path(__file__).parent / "static"


class ViewerServer:
    def __init__(self, testbed, port: int = 8080, bake_resolution: int = 256):
        self.tb = testbed
        self.tb.interactive_bake_resolution = bake_resolution
        self.port = port
        self._lock = threading.Lock()  # one device user at a time
        self._gs = None  # GrowingSelection in progress
        self._applied_idx = None  # index of _gs's operator in the stack, once applied
        self.last_rebake_s = None  # edit/train → rebake latency (seconds)

    # ------------------------------------------------------------- handlers

    def render(self, req: dict) -> bytes:
        from PIL import Image

        w = int(req.get("width", 320))
        h = int(req.get("height", 180))
        spp = int(req.get("spp", 1))
        cam = req.get("camera")
        # default: the baked shear-warp interactive path (~fixed-cost frames
        # at 1080p; auto-rebakes when training stepped or the edit stack
        # changed — VERDICT r2 #3). "exact": true falls back to the
        # per-sample tiled renderer (the eval-quality path).
        exact = bool(req.get("exact", False))
        with self._lock:
            if cam is not None:
                self.tb.camera_matrix = np.asarray(cam, np.float32)
            if exact or self.tb._state is None:
                img = self.tb.render_dynamic(w, h, spp=spp)
            else:
                t0 = time.perf_counter()
                # content-hash key: catches gizmo drags of APPLIED cages and
                # membrane-amplitude changes, not just stack-length changes
                key = self.tb._interactive_key()
                rebaked = getattr(self.tb, "_baked_key", None) != key
                img = self.tb.render_interactive(w, h)
                if rebaked:
                    self.last_rebake_s = time.perf_counter() - t0
            # debug-draw overlays (E17: visualize_cameras / unit cube / cage,
            # reference draw_selection_gl + debug draws, growing_selection.cu)
            if req.get("visualize_cameras") or req.get("visualize_unit_cube") or req.get("visualize_cage"):
                from nerfshop_tpu.viewer import overlay

                tb_for_gs = self.tb
                tb_for_gs._gs = self._gs  # expose the in-progress edit (may be None)
                img = overlay.apply_overlays(
                    np.asarray(img), tb_for_gs,
                    np.asarray(self.tb.camera_matrix, np.float32),
                    self.tb._focal_for(w, h),
                    visualize_cameras=bool(req.get("visualize_cameras")),
                    visualize_unit_cube=bool(req.get("visualize_unit_cube")),
                    visualize_cage=bool(req.get("visualize_cage")),
                )
        arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr, "RGBA").save(buf, "PNG")
        return buf.getvalue()

    def train(self, req: dict) -> dict:
        with self._lock:
            loss = self.tb.train(int(req.get("n_steps", 16)), int(req.get("batch_size", 1 << 18)))
        return {"loss": float(loss), "step": self.tb.stats.step}

    def state(self) -> dict:
        out = {
            "camera": np.asarray(self.tb.camera_matrix).tolist(),
            "fov_deg": self.tb.fov_deg,
            "step": self.tb.stats.step,
            "loss": self.tb.stats.loss,
            "n_operators": len(self.tb.edit_operators),
            "edit_stage": None if self._gs is None else self._gs.stage.name,
            "last_rebake_s": self.last_rebake_s,
            # loss-graph panel data (reference: ImPlot loss graph,
            # src/testbed.cu:2113)
            "loss_history": [[int(s), float(l)] for s, l in self.tb.loss_history[-256:]],
        }
        # cage-vertex handles for the client gizmo
        gs = self._gs
        if gs is not None and getattr(gs, "cage", None) is not None:
            out["cage_vertices"] = np.asarray(gs.cage.vertices_deformed).tolist()
        return out

    def _reapply(self, tb) -> None:
        """If the in-progress cage was already applied, rebuild its operator
        from the dragged vertices and swap it into the stack (the reference
        rebuilds the tet grid per manipulation, tet_mesh.cu:369); the baked
        path's content-hash key then rebakes on the next frame."""
        if self._applied_idx is not None and self._applied_idx < len(tb.edit_operators):
            tb.replace_edit_operator(self._applied_idx, self._gs.make_operator())

    def edit(self, verb: str, req: dict) -> dict:
        import jax.numpy as jnp

        tb = self.tb
        with self._lock:
            if verb == "select_sphere":
                # API-path selection: voxels inside a world-space sphere
                gs = tb.begin_cage_edit()
                c = np.asarray(req.get("center", [0.5, 0.5, 0.5]), np.float32)
                r = float(req.get("radius", 0.1))
                g = (np.arange(128) + 0.5) / 128
                x, y, z = np.meshgrid(g, g, g, indexing="ij")
                sel = (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2 < r * r
                gs.set_selection(sel, level=0)
                self._gs = gs
            elif verb == "project":
                # scribble rays from client pixel coords (E4)
                gs = tb.begin_cage_edit()
                pix = np.asarray(req["pixels"], np.float32)  # [N, 2] in [0,1]
                w, h = int(req.get("width", 320)), int(req.get("height", 180))
                from nerfshop_tpu.ops import rays as rays_lib

                xf = jnp.asarray(tb.camera_matrix)
                focal = jnp.asarray(tb._focal_for(w, h))
                bundle = rays_lib.pixel_to_ray(
                    jnp.asarray(pix * [w, h]), xf, focal,
                    jnp.asarray([0.5, 0.5]), jnp.asarray([w, h], jnp.float32),
                )
                n = gs.project(tb._state.inference_params, tb._grid,
                               np.asarray(bundle.origins), np.asarray(bundle.directions))
                gs.grow_region(tb._grid, int(req.get("growing_steps", 5000)))
                self._gs = gs
                return {"ok": True, "hits": int(n), "stage": gs.stage.name}
            elif verb == "grow":
                self._gs.grow_region(tb._grid, int(req.get("steps", 5000)))
            elif verb == "compute_proxy":
                self._gs.compute_proxy(use_box=bool(req.get("use_box", False)))
            elif verb == "extract_cage":
                self._gs.extract_cage()
            elif verb == "translate":
                self._gs.copy_mode = bool(req.get("copy", False))
                self._gs.translate_cage(np.asarray(req.get("offset", [0, 0, 0]), np.float32))
                self._reapply(tb)
            elif verb == "set_cage_vertices":
                # per-vertex gizmo drag (reference: ImGuizmo manipulation in
                # visualize_edit_gui, growing_selection.cu:459-658)
                self._gs.set_cage_vertices(np.asarray(req["vertices"], np.float32))
                self._reapply(tb)
            elif verb == "move_vertex":
                # single-handle drag: index + new world position
                v = np.asarray(self._gs.cage.vertices_deformed, np.float32).copy()
                v[int(req["index"])] = np.asarray(req["position"], np.float32)
                self._gs.set_cage_vertices(v)
                self._reapply(tb)
            elif verb == "transform_group":
                # group gizmo: rotate/scale/translate a SELECTED vertex set
                # about its centroid (reference rect/brush selection +
                # ImGuizmo group manipulate, growing_selection.cu:459-658,
                # 784-957). mask: explicit indices, or a world-space box.
                self._gs.transform_cage_group(
                    indices=req.get("indices"),
                    box=req.get("box"),
                    rotate_deg=req.get("rotate_deg"),
                    scale=req.get("scale"),
                    offset=req.get("offset"),
                )
                self._reapply(tb)
            elif verb == "membrane":
                # Poisson membrane toggle (reference GUI poisson section,
                # growing_selection.cu:2220-2409): build boundary values for
                # the current deformation, attach to the (re)applied operator
                import jax

                amp = float(req.get("amplitude", 1.0))
                if amp <= 0.0:
                    self._gs.clear_membrane()
                else:
                    self._gs.compute_membrane(
                        tb._state.inference_params, jax.random.PRNGKey(5),
                        amplitude=amp, grid=tb._grid,
                    )
                self._reapply(tb)
            elif verb == "apply":
                op = self._gs.make_operator()
                tb.add_edit_operator(op)
                self._applied_idx = len(tb.edit_operators) - 1
            elif verb == "vanish":
                tb._grid = self._gs.vanish(tb._grid)
            elif verb == "clear":
                tb._edit_operators.clear()
                self._gs = None
                self._applied_idx = None
                if tb._state is not None:
                    tb.refresh_grid_for_edits()
            elif verb == "save_edits":
                tb.save_edits(req.get("path", "edits.json"))
            else:
                return {"ok": False, "error": f"unknown verb {verb}"}
        return {"ok": True, "stage": None if self._gs is None else self._gs.stage.name,
                "n_operators": len(tb.edit_operators)}

    # --------------------------------------------------------------- server

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    html = (_STATIC / "index.html").read_bytes()
                    self._send(200, html, "text/html")
                elif self.path == "/state":
                    self._send(200, json.dumps(server_self.state()).encode())
                else:
                    self._send(404, b"{}")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                try:
                    if self.path == "/render":
                        self._send(200, server_self.render(req), "image/png")
                    elif self.path == "/train":
                        self._send(200, json.dumps(server_self.train(req)).encode())
                    elif self.path.startswith("/edit/"):
                        out = server_self.edit(self.path[len("/edit/"):], req)
                        self._send(200, json.dumps(out).encode())
                    else:
                        self._send(404, b"{}")
                except Exception as e:  # surface errors to the client
                    self._send(500, json.dumps({"error": f"{type(e).__name__}: {e}"}).encode())

        return Handler

    def serve_forever(self):
        httpd = ThreadingHTTPServer(("0.0.0.0", self.port), self.make_handler())
        print(f"viewer: http://localhost:{self.port}/")
        httpd.serve_forever()

    def start_background(self):
        httpd = ThreadingHTTPServer(("127.0.0.1", self.port), self.make_handler())
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd


def serve(testbed, port: int = 8080):
    ViewerServer(testbed, port).serve_forever()
