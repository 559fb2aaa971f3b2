// Matches airjax.track.cpr.GeographicPosition.to_json().

export interface GeographicPosition {
  latitude: number;
  longitude: number;
}
