"""Function surface: scalar registry, introspection TVFs, cross-engine hashing."""
