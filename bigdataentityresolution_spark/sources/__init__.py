"""Sources & sinks: synthetic corpus generator, readers, labeled-pair IO."""
