// Type contract for the EXTENDED WebSocket/REST payloads (backend run
// with --extended): the reference-parity AircraftSummary plus velocity
// and identity extensions. Matches
// airjax.track.aircraft.AircraftSummary.to_json(extended=True).
import type { GeographicPosition } from "./GeographicPosition";

export interface AircraftSummaryExtended {
  icao: number;
  callsign: string;
  altitude: number;
  geoPosition: GeographicPosition | null;
  lastContact: number;
  groundSpeedKt: number | null;
  trackDeg: number | null;
  verticalRateFpm: number | null;
  squawk: number | null;
  onGround: boolean;
  /** Active TCAS resolution-advisory clauses, comma-joined (DF16 BDS 3,0). */
  acasRa: string | null;
  /**
   * Comm-B BDS registers the last DF20/21 MB field validated as
   * (e.g. ["5,0"] or the ambiguous ["5,0", "6,0"]). Length > 1 means the
   * register inference was ambiguous and derived fields are uncertain.
   */
  bdsCandidates: string[] | null;
  /**
   * BDS 4,4 meteorological routine report (applied only when the MB
   * validated as exactly this register): wind_speed_kt, wind_dir_deg,
   * static_air_temp_c, avg_static_pressure_hpa, humidity_pct as
   * available.
   */
  met: { [key: string]: number } | null;
  /**
   * Comm-D ELM content (DF24 segment reassembly): full payload hex,
   * segment count, BDS register candidates inferred from the first 7
   * bytes (empty = non-register payload), and the decoded register
   * when the inference is unambiguous.
   */
  commdElm: { hex: string; segments: number; bds: string[]; decoded?: { [key: string]: number | string } } | null;
}
