"""Topology/restart family: event-only cell that infers how many sync-point
resets its own track will see (projecting track_sync_points_master into the
pattern) and restarts the NEXT track only when the density is odd — a
feedback-free topology rule in the spirit of the reference's
restart_mutating_euclid family, written against the framework context keys.
"""


def event(context):
    ti = int(context.get("track_index", 0))
    tracks = context.get("tracks", [])
    syncs = context.get("track_sync_points_master", []) or []
    offset = float(context.get("track_offset", 0.0))
    dur = float(context.get("master_duration", 0.0))
    n_resets = sum(1 for s in syncs if offset <= float(s) <= dur)
    if n_resets % 2 == 1 and len(tracks) > 1:
        target = (ti + 1) % len(tracks)
        return {"restart_tracks": [target], "delay": 0.0}
    return {}
