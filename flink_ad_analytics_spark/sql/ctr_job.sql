-- Main CTR job, Spark SQL dialect.
-- Re-expression of the reference's flink_job.sql:77-98 (interval LEFT
-- join + 1-minute tumbling window + distinct counts + safe division).
-- Expects views:
--   impressions(impression_id, campaign_id, ..., event_time TIMESTAMP)
--   clicks(click_id, impression_id, user_id, click_time TIMESTAMP)
-- Equivalence to operators/ctr.py::ctr_windows (the semantic spec) is
-- asserted by tests/test_sql_scripts.py.
SELECT
  agg.w.start AS window_start,
  agg.w.end   AS window_end,
  agg.campaign_id,
  agg.impression_count,
  agg.click_count,
  CASE WHEN agg.impression_count > 0
       THEN CAST(agg.click_count AS DOUBLE) / CAST(agg.impression_count AS DOUBLE)
       ELSE 0.0
  END AS ctr
FROM (
  SELECT
    window(i.event_time, '1 minute') AS w,
    i.campaign_id,
    COUNT(DISTINCT i.impression_id) AS impression_count,
    COUNT(DISTINCT c.click_id)      AS click_count
  FROM impressions i
  LEFT JOIN clicks c
    ON i.impression_id = c.impression_id
   AND c.click_time BETWEEN i.event_time
                        AND i.event_time + INTERVAL 10 MINUTES
  GROUP BY window(i.event_time, '1 minute'), i.campaign_id
) agg
