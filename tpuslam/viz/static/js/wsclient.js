// tpu-slam browser client.  Wire-compatible with the reference protocol
// (inbound message types and payload field names match
// sim/browser/wsserver.jl; commands {type:'request', text:...} match
// wsclient.js's sendReset shape).  Rendering is dependency-free SVG.
(function () {
  'use strict';

  var W = 600, H = 600, EXTENT = 100;  // scene is 100x100 m
  var SENSOR_RANGE = 30;               // m (ref ekfslam-sim.jl:33)
  var svg = document.querySelector('svg.scene');
  var status = document.getElementById('status');
  var NS = 'http://www.w3.org/2000/svg';

  function sx(x) { return x / EXTENT * W; }
  function sy(y) { return H - y / EXTENT * H; }   // y up -> SVG y down

  function el(tag, attrs, parent) {
    var e = document.createElementNS(NS, tag);
    for (var k in attrs) e.setAttribute(k, attrs[k]);
    (parent || svg).appendChild(e);
    return e;
  }

  // Layer groups (z-order).
  var gWaypoints = el('g', {}), gLandmarks = el('g', {}),
      gTrueTrack = el('g', {}), gSlamTrack = el('g', {}),
      gLidar = el('g', {}), gEllipses = el('g', {}), gVehicle = el('g', {});

  var truePath = null, slamPath = null;
  var truePts = [], slamPts = [];

  function polyline(points) {
    return points.map(function (p) { return sx(p[0]) + ',' + sy(p[1]); })
      .join(' ');
  }

  function resetScene() {
    [gTrueTrack, gSlamTrack, gLidar, gEllipses, gVehicle].forEach(
      function (g) { while (g.firstChild) g.removeChild(g.firstChild); });
    truePts = []; slamPts = [];
    truePath = el('polyline', { 'class': 'true-track' }, gTrueTrack);
    slamPath = el('polyline', { 'class': 'slam-track' }, gSlamTrack);
  }
  resetScene();

  var handlers = {
    'waypoints': function (data) {
      data.forEach(function (d) {
        el('circle', { cx: sx(d.x), cy: sy(d.y), r: 4, 'class': 'waypoint' },
           gWaypoints);
      });
    },
    'landmarks': function (data) {
      data.forEach(function (d) {
        el('rect', { x: sx(d.x) - 5, y: sy(d.y) - 5, width: 10, height: 10,
                     rx: 1, 'class': 'landmark' }, gLandmarks);
      });
    },
    'tracks': function (data) {
      truePts.push([data.ideal.x, data.ideal.y]);
      slamPts.push([data.slam.x, data.slam.y]);
      truePath.setAttribute('points', polyline(truePts));
      slamPath.setAttribute('points', polyline(slamPts));
    },
    'state': function (data) { /* pose + covariance available for tooling */ },
    'lidar': function (data) {
      while (gLidar.firstChild) gLidar.removeChild(gLidar.firstChild);
      data.forEach(function (d) {
        var line = el('line', { x1: sx(d.x1), y1: sy(d.y1),
                                x2: sx(d.x2), y2: sy(d.y2),
                                'class': 'lidar' }, gLidar);
        // Fade out like the reference client's lidar decay.
        line.style.transition = 'opacity 0.6s';
        setTimeout(function () { line.style.opacity = 0; }, 50);
      });
    },
    'feature-ellipses': function (data) {
      while (gEllipses.firstChild) gEllipses.removeChild(gEllipses.firstChild);
      data.forEach(function (d) {
        el('ellipse', {
          cx: 0, cy: 0,
          rx: 2 * d.rx / EXTENT * W, ry: 2 * d.ry / EXTENT * H,
          'class': 'feature-ellipse',
          // y is up in sim, down in SVG: negate the rotation (same trick
          // as the reference client).
          transform: 'translate(' + sx(d.cx) + ',' + sy(d.cy) + ') ' +
                     'rotate(' + (-d.phi * 180 / Math.PI) + ')'
        }, gEllipses);
      });
    },
    'vehicle-ellipse': function (data) {
      while (gVehicle.firstChild) gVehicle.removeChild(gVehicle.firstChild);
      var d = data[0];
      el('ellipse', {
        cx: 0, cy: 0,
        rx: Math.max(2 * d.rx / EXTENT * W, 1),
        ry: Math.max(2 * d.ry / EXTENT * H, 1),
        'class': 'vehicle-ellipse',
        transform: 'translate(' + sx(d.cx) + ',' + sy(d.cy) + ') ' +
                   'rotate(' + (-d.phi * 180 / Math.PI) + ')'
      }, gVehicle);
      // Vehicle triangle oriented by heading.
      el('polygon', {
        points: '6,0 -4,3 -4,-3', 'class': 'vehicle',
        transform: 'translate(' + sx(d.cx) + ',' + sy(d.cy) + ') ' +
                   'rotate(' + (-d.vehicle_phi * 180 / Math.PI) + ')'
      }, gVehicle);
      // Lidar sweep sector: the sensor's forward half-plane out to range
      // (annular half-disc, like the reference client's d3 arc with
      // innerRadius 20 px / outerRadius = scaled sensor range, ref
      // wsclient.js:156-185).  At heading 0 the sector covers +x; the
      // rotate(-phi) maps it to the vehicle's front half-plane.
      var R = sx(SENSOR_RANGE), r = 20;
      el('path', {
        d: 'M 0,' + (-R) + ' A ' + R + ',' + R + ' 0 0 1 0,' + R +
           ' L 0,' + r + ' A ' + r + ',' + r + ' 0 0 0 0,' + (-r) + ' Z',
        'class': 'lidar-sweep',
        transform: 'translate(' + sx(d.cx) + ',' + sy(d.cy) + ') ' +
                   'rotate(' + (-d.vehicle_phi * 180 / Math.PI) + ')'
      }, gVehicle);
    }
  };

  // Same host:port as the page — the server multiplexes HTTP and WS on
  // one port (ref wsserver.jl:221-223).
  var ws = new WebSocket('ws://' + window.location.host);
  ws.onopen = function () {
    status.textContent = 'connected';
    send('ready');
  };
  ws.onclose = function () { status.textContent = 'disconnected'; };
  ws.onmessage = function (ev) {
    var msg = JSON.parse(ev.data);
    var h = handlers[msg.type];
    if (h) h(msg.data);
  };

  function send(text) {
    ws.send(JSON.stringify(
      { type: 'request', text: text, id: 2, date: Date.now() }));
  }

  document.getElementById('start').onclick = function () { send('start'); };
  document.getElementById('pause').onclick = function () { send('pause'); };
  document.getElementById('reset').onclick = function () {
    send('reset'); resetScene();
  };
})();
