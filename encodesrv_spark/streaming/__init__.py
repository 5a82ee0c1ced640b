# Structured Streaming analogs of the reference's poll loop and the
# event-stream operators the reference lacks (watermarks, windows).
