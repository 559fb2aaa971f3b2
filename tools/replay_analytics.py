"""Whole-capture replay analytics: .c16 -> per-aircraft track report.

Decodes the full capture with the batched device pipeline and prints one
JSON object per aircraft (callsign, message count, altitude range, every
position fix). This is the bulk counterpart of the live tracker — the
reference has no equivalent (its tracker only holds the latest state).

Usage: python tools/replay_analytics.py capture.c16 [--json out.json]
"""

import argparse
import json
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("capture", help=".c16 capture file")
    ap.add_argument("--json", default=None, help="also write a JSON report")
    args = ap.parse_args()

    from airjax.analytics import analyze_capture
    from airjax.io.c16 import load_c16

    iq = load_c16(args.capture)
    tracks, stats = analyze_capture(iq)

    report = []
    for icao, t in sorted(tracks.items()):
        alts = [a for _, a in t.altitudes]
        report.append(
            {
                "icao": f"{icao:06x}",
                "callsign": t.callsign,
                "messages": t.n_messages,
                "altitude_ft": [min(alts), max(alts)] if alts else None,
                "fixes": [
                    {
                        "offset": fx.offset,
                        "t_s": round(fx.offset / 2e6, 3),
                        "lat": round(fx.latitude, 6),
                        "lon": round(fx.longitude, 6),
                        "alt_ft": fx.altitude_ft,
                    }
                    for fx in t.fixes
                ],
            }
        )
    for entry in report:
        print(json.dumps(entry))
    print(f"stats: {json.dumps(stats)}", file=sys.stderr)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"aircraft": report, "stats": stats}, f, indent=1)


if __name__ == "__main__":
    main()
