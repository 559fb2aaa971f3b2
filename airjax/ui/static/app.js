// airjax live aircraft display — plain-JS canvas client.
// Consumes the same WebSocket JSON schema as the reference frontend
// (AircraftSummary: {icao, callsign, altitude, geoPosition, lastContact}).

"use strict";

const canvas = document.getElementById("radar");
const ctx = canvas.getContext("2d");
const aircraft = new Map(); // icao -> summary
let packets = 0;
let center = null; // {lat, lon}

function resize() {
  canvas.width = window.innerWidth * devicePixelRatio;
  canvas.height = window.innerHeight * devicePixelRatio;
}
window.addEventListener("resize", resize);
resize();

function connect() {
  const ws = new WebSocket(`ws://${location.host}/ws`);
  ws.onmessage = (ev) => {
    const summary = JSON.parse(ev.data);
    packets += 1;
    aircraft.set(summary.icao, { ...summary, seen: Date.now() / 1000 });
    if (!center && summary.geoPosition) {
      center = { lat: summary.geoPosition.latitude, lon: summary.geoPosition.longitude };
    }
  };
  ws.onclose = () => setTimeout(connect, 2000);
}
connect();

const R_EARTH_M = 6371000;
function project(lat, lon) {
  // Local azimuthal approximation around the display center.
  const dLat = ((lat - center.lat) * Math.PI) / 180;
  const dLon = ((lon - center.lon) * Math.PI) / 180;
  const x = dLon * Math.cos((center.lat * Math.PI) / 180) * R_EARTH_M;
  const y = -dLat * R_EARTH_M;
  return { x, y };
}

function draw() {
  const w = canvas.width, h = canvas.height;
  ctx.clearRect(0, 0, w, h);
  ctx.fillStyle = "#0b1020";
  ctx.fillRect(0, 0, w, h);

  const withPos = [...aircraft.values()].filter((a) => a.geoPosition);

  // Scale so the furthest aircraft stays on screen.
  let scale = 0.002 * devicePixelRatio; // px per meter fallback
  if (center && withPos.length) {
    let rmax = 1000;
    for (const a of withPos) {
      const p = project(a.geoPosition.latitude, a.geoPosition.longitude);
      rmax = Math.max(rmax, Math.hypot(p.x, p.y));
    }
    scale = (0.42 * Math.min(w, h)) / rmax;
  }

  // Range rings.
  if (center) {
    ctx.strokeStyle = "#1d2b50";
    ctx.fillStyle = "#5a6c9e";
    ctx.font = `${12 * devicePixelRatio}px monospace`;
    for (const km of [10, 25, 50, 100, 200]) {
      const r = km * 1000 * scale;
      if (r > Math.hypot(w, h)) break;
      ctx.beginPath();
      ctx.arc(w / 2, h / 2, r, 0, 2 * Math.PI);
      ctx.stroke();
      ctx.fillText(`${km} km`, w / 2 + r * 0.707, h / 2 - r * 0.707);
    }
  }

  // Aircraft.
  ctx.font = `${12 * devicePixelRatio}px monospace`;
  for (const a of aircraft.values()) {
    if (!a.geoPosition || !center) continue;
    const p = project(a.geoPosition.latitude, a.geoPosition.longitude);
    const x = w / 2 + p.x * scale, y = h / 2 + p.y * scale;
    const age = Date.now() / 1000 - a.seen;
    ctx.fillStyle = age < 15 ? "#ffd75a" : "#7a6a30";
    ctx.beginPath();
    ctx.arc(x, y, 4 * devicePixelRatio, 0, 2 * Math.PI);
    ctx.fill();
    ctx.strokeStyle = "#39508c";
    ctx.beginPath();
    ctx.moveTo(x + 5, y - 5);
    ctx.lineTo(x + 18, y - 18);
    ctx.stroke();
    ctx.fillStyle = "#dfe7ff";
    const label = `${a.callsign || a.icao.toString(16)} ${a.altitude}ft`;
    ctx.fillText(label, x + 20, y - 20);
  }

  // Stats box + table of aircraft without positions.
  ctx.fillStyle = "#101a38";
  ctx.fillRect(8, 8, 330 * devicePixelRatio, (48 + 16 * aircraft.size) * devicePixelRatio / devicePixelRatio);
  ctx.fillStyle = "#9fb4ea";
  let ty = 26;
  ctx.fillText(`aircraft: ${aircraft.size}  msgs: ${packets}`, 16, ty);
  ty += 20;
  for (const a of aircraft.values()) {
    if (a.geoPosition) continue;
    ctx.fillText(
      `${a.icao.toString(16).padStart(6, "0")} ${a.callsign || "-"} ${a.altitude}ft (no pos)`,
      16, ty);
    ty += 16;
  }

  requestAnimationFrame(draw);
}
requestAnimationFrame(draw);
