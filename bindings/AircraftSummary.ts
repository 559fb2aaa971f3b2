// Type contract for the airjax WebSocket/REST payloads. Matches the
// camelCase JSON emitted by airjax.track.aircraft.AircraftSummary.to_json()
// (and is wire-compatible with the reference's ts-rs-generated bindings,
// so either frontend can talk to either backend).
import type { GeographicPosition } from "./GeographicPosition";

export interface AircraftSummary {
  icao: number;
  callsign: string;
  altitude: number;
  geoPosition: GeographicPosition | null;
  lastContact: number;
}
