-- committed golden (deterministic output at sf0.01);
-- regenerate with tools/gen_value_goldens.py
WITH fp AS (SELECT count(*) = 10000 AND CAST(sum(user_id) AS BIGINT) = 742783 AS ok FROM events)
SELECT * FROM (VALUES
  ('click', 148),
  ('error', 148),
  ('purchase', 148),
  ('signup', 148),
  ('view', 148)
) AS t(event_type, est)
WHERE (SELECT ok FROM fp)
UNION ALL
SELECT -999999, -999999
WHERE NOT (SELECT ok FROM fp)  -- GOLDEN_INPUT_MISMATCH sentinel