"""User-defined function surface (SURVEY.md E26) — the engine's typed
escape hatch, playing the reference's arbitrary message handler
(/root/reference/lib/stream.ex:11, consumer.ex:283-299)."""
