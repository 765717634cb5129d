"""U1 — the reference's stub ``JsonToCsvTransformerOperator`` made real
(plugins/file_transformer_plugin.py:5-13: execute() only prints a message).

Engine realization (SURVEY.md §2.8 U1): distributed JSON→CSV conversion.
Nested fields are flattened to dotted columns and arrays serialized back to
JSON text, since CSV is flat; an explicit schema is accepted to avoid
inference over 100 TB (schema-on-read sampling is a full extra pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten(df: DataFrame) -> DataFrame:
    """Flatten structs to dotted columns; serialize arrays/maps to JSON text."""
    while True:
        cols = []
        has_struct = False
        for field in df.schema.fields:
            if isinstance(field.dataType, T.StructType):
                has_struct = True
                for sub in field.dataType.fields:
                    cols.append(
                        F.col(f"`{field.name}`.`{sub.name}`").alias(
                            f"{field.name}.{sub.name}"
                        )
                    )
            elif isinstance(field.dataType, (T.ArrayType, T.MapType)):
                cols.append(F.to_json(F.col(f"`{field.name}`")).alias(field.name))
            else:
                cols.append(F.col(f"`{field.name}`"))
        df = df.select(*cols)
        if not has_struct:
            return df


def json_to_csv(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    schema: T.StructType | None = None,
    *,
    multiline: bool = False,
) -> DataFrame:
    """Read JSON (lines by default), flatten, write CSV with header.
    Returns the flattened DataFrame for inspection/tests."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.option("multiLine", str(multiline).lower()).json(input_path)
    flat = _flatten(df)
    flat.write.mode("overwrite").option("header", "true").csv(output_path)
    return flat
