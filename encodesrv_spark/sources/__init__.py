# Sources & sinks: config documents, binary/media files, FS listings,
# JDBC scaffolding (SURVEY.md §2.1 S1-S15).
