from .metadata import (  # noqa: F401
    ColumnInfo,
    FKRelationship,
    SchemaMetadata,
    TableInfo,
    generate_schema_id,
)
