/*
 Saved analytical queries — the executable specification of the query
 surface (semantics of /root/reference/sql/saved-queries.sql:10-45,
 run here by Spark SQL instead of Athena).

 Placeholders: ${db} catalog database, ${metadata_table_prefix} /
 ${data_table_prefix} table-name prefixes, ${state} lowercase state
 suffix for the per-state data view, and the three filter values.
 */
-- label: Total Number of Individual Building Models
-- description: Total number of unique building models of a type in a county.
SELECT COUNT(DISTINCT m.bldg_id) AS total_buildings
FROM ${db}.${metadata_table_prefix}_parquet AS m
    JOIN ${db}.${data_table_prefix}_state_${state} AS d ON m.bldg_id = d.bldg_id_min
WHERE m."in.state" = '${state_value}'
    AND m."in.county_name" = '${county_value}'
    AND m."in.comstock_building_type" = '${building_type}';
-- label: Number of Buildings by Building Type Group
-- description: Unique building count per building type group in a county.
SELECT m."in.comstock_building_type_group",
    COUNT(DISTINCT m.bldg_id) AS num_buildings
FROM ${db}.${metadata_table_prefix}_parquet AS m
    JOIN ${db}.${data_table_prefix}_state_${state} AS d ON m.bldg_id = d.bldg_id_min
WHERE m."in.state" = '${state_value}'
    AND m."in.county_name" = '${county_value}'
GROUP BY m."in.comstock_building_type_group";
-- label: Isolated Individual Building Models
-- description: Up to 500 building models for one building type group in a county.
WITH filtered_buildings AS (
    SELECT DISTINCT m.bldg_id,
        m."in.comstock_building_type_group",
        ROW_NUMBER() OVER (
            PARTITION BY m."in.comstock_building_type_group"
            ORDER BY m.bldg_id
        ) AS rn
    FROM ${db}.${metadata_table_prefix}_parquet AS m
        JOIN ${db}.${data_table_prefix}_state_${state} AS d ON m.bldg_id = d.bldg_id_min
    WHERE m."in.state" = '${state_value}'
        AND m."in.county_name" = '${county_value}'
)
SELECT DISTINCT bldg_id,
    "in.comstock_building_type_group"
FROM filtered_buildings
WHERE "in.comstock_building_type_group" = '${building_type_group}'
    AND rn <= 500;
