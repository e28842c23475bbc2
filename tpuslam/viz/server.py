"""WebSocket + HTTP telemetry server for browser visualization.

Behavioral parity with the reference server (sim/browser/wsserver.jl):
same port-8000 HTTP file allowlist, same WS command set
(ready/start/reset/pause, wsserver.jl:151-182), same outbound message
schema (viz/protocol.py).  Architectural fix over the reference: its
pause/start path can spawn a SECOND concurrent sim task on shared state
(wsserver.jl:157-159 vs 176-181 — the race flagged in SURVEY.md section
3.4).  Here a single owner task runs the simulation and commands go
through flags owned by the connection handler.

The engine runs one jitted epoch per step (device), then streams the
epoch's 9 per-tick records (decimated device->host transfer: one transfer
per epoch, not per tick), paced to the reference's 40 Hz real-time rate.

Run:  python -m tpuslam.viz.server [--port 8000] [--landmarks 10]
"""

from __future__ import annotations

import argparse
import asyncio
import functools
import os

import numpy as np

from tpuslam.config import course1_config
from tpuslam.core.ellipse import laser_lines
from tpuslam.viz import protocol

STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")
ALLOWED_FILES = {"index.html", "js/wsclient.js"}


class SimSession:
    """Owns the simulation state for one browser client."""

    def __init__(self, cfg, seed=3, dtype=None):
        import jax
        import jax.numpy as jnp

        from tpuslam.sim.scene import load_course, make_landmarks
        from tpuslam.sim.sensors import get_observations
        from tpuslam.sim.simulator import epoch, init_sim_state

        self.cfg = cfg
        dtype = dtype or jnp.float32
        self.waypoints = np.asarray(load_course())
        self.landmarks = np.asarray(make_landmarks(cfg.scene, seed=seed))
        self._wp = jnp.asarray(self.waypoints, dtype)
        self._lm = jnp.asarray(self.landmarks, dtype)
        self._dtype = dtype
        self._init_state = lambda: init_sim_state(cfg, self._wp, dtype=dtype)
        self.state = self._init_state()
        self.key = jax.random.key(seed + 1)
        self.paused = False
        self.running = False

        sig_c = jnp.asarray([cfg.noise.sigma_speed, cfg.noise.sigma_steer],
                            dtype)
        sig_o = jnp.asarray([cfg.noise.sigma_range, cfg.noise.sigma_bearing],
                            dtype)

        @jax.jit
        def step(st, key):
            key, k1, k2 = jax.random.split(key, 3)
            ctrl = jax.random.normal(
                k1, (cfg.substeps_per_obs, 2), dtype) * sig_c
            obs_noise = jax.random.normal(
                k2, (self._lm.shape[0], 2), dtype) * sig_o
            st2, recs = epoch(cfg, self._wp, self._lm, st, (ctrl, obs_noise))
            # Re-derive the final observation batch for the lidar display.
            z, z_mask, _ = get_observations(
                st2.vehicle.pose, self._lm, cfg.vehicle.sensor_range,
                obs_noise, cfg.max_obs,
            )
            return st2, key, recs, z, z_mask

        self._step = step

    def reset(self):
        """Ref wsserver.jl:161-174."""
        self.state = self._init_state()
        self.paused = False

    def epoch_step(self):
        """One observation epoch on device; returns host-side telemetry."""
        self.state, self.key, recs, z, z_mask = self._step(self.state, self.key)
        recs = np.asarray(recs.true_pose), np.asarray(recs.slam_pose), \
            np.asarray(recs.active)
        return recs, np.asarray(z), np.asarray(z_mask)

    @property
    def done(self):
        return int(self.state.vehicle.waypoint_id) == -1


async def sim_loop(session: SimSession, ws, tick_cov: str = "epoch"):
    """Single-owner simulation task: streams telemetry until course end.

    tick_cov: what pose covariance the per-tick state/vehicle-ellipse
    messages carry.  "epoch" (default) sends the epoch-end value — the
    engine materializes P once per observation epoch by design (telemetry
    decimation; the pose MEAN is exact per tick).  "interp" linearly
    blends the 3x3 pose block from the previous epoch's end to this one's
    per tick — display-only smoothing approximating the reference's
    per-tick predict growth (ekf.jl predict runs every tick there).
    """
    cfg = session.cfg
    session.running = True
    P_prev = None
    try:
        while not session.done:
            if session.paused:
                await asyncio.sleep(0.05)
                continue
            (true_p, slam_p, active), z, z_mask = session.epoch_step()
            st = session.state
            x = np.asarray(st.ekf.x)
            P = np.asarray(st.ekf.P)
            n = int(st.ekf.n)
            if P_prev is None or P_prev.shape != P.shape:
                P_prev = P
            nticks = int(active.sum())
            for t in range(nticks):
                # Per-tick messages (ref monitor, wsserver.jl:31-66): tracks,
                # state and vehicle-ellipse every tick; lidar + feature
                # ellipses only on update ticks.
                if tick_cov == "interp" and nticks > 1:
                    w = (t + 1) / nticks
                    Pt = P.copy()
                    Pt[:3, :3] = (1 - w) * P_prev[:3, :3] + w * P[:3, :3]
                else:
                    Pt = P
                await ws.send(protocol.tracks_msg(true_p[t], slam_p[t]))
                await ws.send(protocol.state_msg(slam_p[t], Pt, n))
                if t == cfg.substeps_per_obs - 1:
                    nz = int(z_mask.sum())
                    if nz > 0:
                        # Ref draws beams from the SLAM pose (wsserver.jl:42).
                        lines = np.asarray(laser_lines(z[z_mask], x[:3]))
                        await ws.send(protocol.lidar_msg(lines))
                        if n > 0:
                            await ws.send(
                                protocol.feature_ellipses_msg(x, P, n))
                await ws.send(protocol.vehicle_ellipse_msg(slam_p[t], Pt))
                # Real-time pacing (ref ekfslam-sim.jl:133-137).
                await asyncio.sleep(cfg.dt)
            P_prev = P
    finally:
        session.running = False


async def ws_handler(ws, session_factory, sessions, tick_cov="epoch"):
    """Ref command set: wsserver.jl:151-182."""
    import json

    session = session_factory()
    sessions.append(session)
    sim_task = None
    async for raw in ws:
        try:
            msg = json.loads(raw)
        except json.JSONDecodeError:
            continue
        text = msg.get("text")
        if text == "ready":
            await ws.send(
                protocol.envelope("waypoints",
                                  protocol.xy_dicts(session.waypoints)))
            await ws.send(
                protocol.envelope("landmarks",
                                  protocol.xy_dicts(session.landmarks)))
        elif text == "start":
            session.paused = False
            if sim_task is None or sim_task.done():
                sim_task = asyncio.create_task(
                    sim_loop(session, ws, tick_cov=tick_cov))
        elif text == "reset":
            session.reset()
        elif text == "pause":
            # Toggling only flips the flag; the single owner task keeps
            # running (no double-spawn — the reference's race).
            session.paused = not session.paused
    if sim_task:
        sim_task.cancel()


def _static_response(conn, request):
    """Serve the static files on the SAME port as the WebSocket (ref
    wsserver.jl:221-223 runs one port-8000 server for both), with the
    reference's explicit allowlist (wsserver.jl:192-215).  Returning None
    lets a WebSocket upgrade proceed to the handshake."""
    if request.headers.get("Upgrade", "").lower() == "websocket":
        return None
    from websockets.datastructures import Headers
    from websockets.http11 import Response

    path = request.path.split("?")[0]
    rel = ("index.html" if path == "/" else path.lstrip("/"))
    if rel in ALLOWED_FILES:
        with open(os.path.join(STATIC_DIR, rel), "rb") as f:
            body = f.read()
        ctype = ("text/html" if rel.endswith(".html")
                 else "application/javascript")
        return Response(
            200, "OK",
            Headers({"Content-Type": ctype,
                     "Content-Length": str(len(body))}),
            body,
        )
    return Response(404, "Not Found",
                    Headers({"Content-Length": "0"}), b"")


async def serve(cfg, host="0.0.0.0", port=8000, seed=3,
                ready_event=None, tick_cov="epoch"):
    """One port for HTTP + WS, like the reference (wsserver.jl:221-223)."""
    import websockets

    sessions = []
    factory = functools.partial(SimSession, cfg, seed=seed)
    async with websockets.serve(
        functools.partial(ws_handler, session_factory=factory,
                          sessions=sessions, tick_cov=tick_cov),
        host, port,
        process_request=_static_response,
    ):
        print(f"HTTP + WS on :{port}")
        if ready_event is not None:
            ready_event.set()
        await asyncio.Future()  # run forever


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--landmarks", type=int, default=10)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--tick-cov", choices=("epoch", "interp"),
                    default="epoch")
    args = ap.parse_args()
    cfg = course1_config(n_landmarks=args.landmarks)
    asyncio.run(serve(cfg, port=args.port, seed=args.seed,
                      tick_cov=args.tick_cov))


if __name__ == "__main__":
    main()
