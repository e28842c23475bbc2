"""Telemetry protocol + server end-to-end test (WS client drives the sim)."""

import asyncio
import json

import numpy as np
import pytest

from tpuslam.config import course1_config
from tpuslam.core.geometry import inbounds
from tpuslam.viz import protocol


class TestProtocol:
    def test_envelope_schema(self):
        msg = json.loads(protocol.envelope("tracks", {"a": 1}))
        assert set(msg) == {"type", "data", "timestamp"}
        assert msg["type"] == "tracks"

    def test_tracks_fields(self):
        d = json.loads(protocol.tracks_msg([1, 2, 0.3], [1.1, 2.1, 0.31]))
        assert set(d["data"]) == {"ideal", "slam"}
        assert set(d["data"]["ideal"]) == {"x", "y", "phi"}

    def test_state_active_slice(self):
        x = np.arange(11.0)
        P = np.eye(11)
        d = json.loads(protocol.state_msg(x, P, 2))
        assert len(d["data"]["pose"]) == 3
        assert len(d["data"]["cov"]) == 7  # 3 + 2*2

    def test_feature_ellipse_fields(self):
        x = np.array([0, 0, 0, 5.0, 6.0])
        P = np.eye(5) * 0.01
        d = json.loads(protocol.feature_ellipses_msg(x, P, 1))
        assert set(d["data"][0]) == {"cx", "cy", "rx", "ry", "phi"}
        assert d["data"][0]["cx"] == 5.0

    def test_vehicle_ellipse_fields(self):
        d = json.loads(
            protocol.vehicle_ellipse_msg(np.array([1.0, 2, 0.3]),
                                         np.eye(3) * 0.04)
        )
        assert set(d["data"][0]) == {
            "cx", "cy", "vehicle_phi", "rx", "ry", "phi"
        }
        assert d["data"][0]["rx"] == pytest.approx(0.2)


@pytest.mark.timeout(120)
def test_server_end_to_end():
    """Start the server, drive it over a real WebSocket like the browser
    does (ready -> start -> pause -> reset), validate message schema and
    reference-style invariants (lidar endpoints inbounds, wsserver.jl:46)."""
    import websockets

    from tpuslam.viz.server import serve

    cfg = course1_config(n_landmarks=8, capacity=16, max_obs=12)

    async def scenario():
        ready = asyncio.Event()
        server = asyncio.create_task(
            serve(cfg, host="127.0.0.1", port=8765,
                  seed=3, ready_event=ready)
        )
        await asyncio.wait_for(ready.wait(), 30)

        got = {}
        async with websockets.connect("ws://127.0.0.1:8765") as ws:
            async def send(text):
                await ws.send(json.dumps({"type": "request", "text": text}))

            await send("ready")
            for _ in range(2):
                msg = json.loads(await asyncio.wait_for(ws.recv(), 10))
                got[msg["type"]] = msg["data"]
            assert set(got) == {"waypoints", "landmarks"}
            assert len(got["landmarks"]) == 8

            await send("start")
            deadline = asyncio.get_event_loop().time() + 60
            while (len({"tracks", "state", "vehicle-ellipse", "lidar"}
                       - set(got)) > 0
                   and asyncio.get_event_loop().time() < deadline):
                msg = json.loads(await asyncio.wait_for(ws.recv(), 30))
                got[msg["type"]] = msg["data"]
            assert "tracks" in got and "state" in got
            assert "vehicle-ellipse" in got
            assert "lidar" in got
            for seg in got["lidar"]:
                assert inbounds(
                    np.array([seg["x1"], seg["y1"]]), cfg.scene.boundaries
                )
            # HTTP allowlist: index served, others 404.  (urlopen is
            # synchronous — run in a thread so it doesn't block the event
            # loop the server lives on.)
            import urllib.request

            def fetch(path):
                return urllib.request.urlopen(
                    f"http://127.0.0.1:8765{path}", timeout=10
                ).read().decode()

            html = await asyncio.to_thread(fetch, "/")
            assert "tpu-slam" in html
            with pytest.raises(Exception):
                await asyncio.to_thread(fetch, "/etc/passwd")

            await send("pause")
            await send("reset")
        server.cancel()

    asyncio.run(scenario())
