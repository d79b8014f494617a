"""Optional integrations that need packages this engine does not
require for its core paths. Import failures here are expected and
surfaced as actionable errors at OPERATOR CALL time, never from
inside a running executor UDF."""
