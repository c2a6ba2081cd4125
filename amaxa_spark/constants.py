"""Engine constants mirroring the reference's surface
(`/root/reference/amaxa/constants.py`)."""

# result-file column headers
ORIGINAL_ID = "Original Id"
NEW_ID = "New Id"
ERROR = "Error"

# advisory options accepted for config compatibility; partitioning
# subsumes API batching (SURVEY §4), so these map to hints only
ADVISORY_OPTIONS = {
    "bulk-api-batch-size",
    "bulk-api-timeout",
    "bulk-api-poll-interval",
    "bulk-api-mode",
}
