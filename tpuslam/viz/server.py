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


async def sim_loop(session: SimSession, ws):
    """Single-owner simulation task: streams telemetry until course end."""
    cfg = session.cfg
    session.running = True
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
            nticks = int(active.sum())
            for t in range(nticks):
                # Per-tick messages (ref monitor, wsserver.jl:31-66): tracks,
                # state and vehicle-ellipse every tick; lidar + feature
                # ellipses only on update ticks.  NOTE: within an epoch the
                # covariance shown is the epoch-end value — the engine
                # materializes P once per observation epoch by design
                # (telemetry decimation; the pose mean is exact per tick).
                await ws.send(protocol.tracks_msg(true_p[t], slam_p[t]))
                await ws.send(protocol.state_msg(slam_p[t], P, n))
                if t == cfg.substeps_per_obs - 1:
                    nz = int(z_mask.sum())
                    if nz > 0:
                        # Ref draws beams from the SLAM pose (wsserver.jl:42).
                        lines = np.asarray(laser_lines(z[z_mask], x[:3]))
                        await ws.send(protocol.lidar_msg(lines))
                        if n > 0:
                            await ws.send(
                                protocol.feature_ellipses_msg(x, P, n))
                await ws.send(protocol.vehicle_ellipse_msg(slam_p[t], P))
                # Real-time pacing (ref ekfslam-sim.jl:133-137).
                await asyncio.sleep(cfg.dt)
    finally:
        session.running = False


async def ws_handler(ws, session_factory, sessions):
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
                sim_task = asyncio.create_task(sim_loop(session, ws))
        elif text == "reset":
            session.reset()
        elif text == "pause":
            # Toggling only flips the flag; the single owner task keeps
            # running (no double-spawn — the reference's race).
            session.paused = not session.paused
    if sim_task:
        sim_task.cancel()


async def http_handler(reader, writer):
    """Minimal static file server with the reference's explicit allowlist
    (wsserver.jl:192-215)."""
    try:
        request = (await reader.readline()).decode()
        while (await reader.readline()) not in (b"\r\n", b""):
            pass
        parts = request.split()
        path = parts[1] if len(parts) > 1 else "/"
        if path == "/":
            path = "/index.html"
        rel = path.lstrip("/")
        if rel in ALLOWED_FILES:
            full = os.path.join(STATIC_DIR, rel)
            with open(full, "rb") as f:
                body = f.read()
            ctype = ("text/html" if rel.endswith(".html")
                     else "application/javascript")
            head = (f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n").encode()
            writer.write(head + body)
        else:
            writer.write(b"HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n")
        await writer.drain()
    finally:
        writer.close()


async def serve(cfg, host="0.0.0.0", ws_port=8000, http_port=8001, seed=3,
                ready_event=None):
    import websockets

    sessions = []
    factory = functools.partial(SimSession, cfg, seed=seed)
    http_server = await asyncio.start_server(http_handler, host, http_port)
    async with websockets.serve(
        functools.partial(ws_handler, session_factory=factory,
                          sessions=sessions),
        host, ws_port,
    ):
        print(f"HTTP on :{http_port}  WS on :{ws_port}")
        if ready_event is not None:
            ready_event.set()
        await asyncio.Future()  # run forever


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ws-port", type=int, default=8000)
    ap.add_argument("--http-port", type=int, default=8001)
    ap.add_argument("--landmarks", type=int, default=10)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()
    cfg = course1_config(n_landmarks=args.landmarks)
    asyncio.run(serve(cfg, ws_port=args.ws_port, http_port=args.http_port,
                      seed=args.seed))


if __name__ == "__main__":
    main()
