"""Sinks: ordered multipart cloud writes + standard DataFrame writers."""
