"""Restart family: event-only cell restarting tracks 1 and 2 by index,
one sixteenth later (the minimal restart-protocol demo).
"""


def event(context):
    return {"restart_tracks": [1, 2], "delay": 0.0625}
