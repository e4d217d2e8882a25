-- Engagement-by-device job, Spark SQL dialect.
-- Re-expression of the reference's flink_job.sql:102-118 (same join +
-- window as the CTR query, keyed by COALESCE(device_type, 'Unknown')).
SELECT
  agg.w.start AS window_start,
  agg.w.end   AS window_end,
  agg.device_type,
  agg.impression_count,
  agg.click_count,
  CASE WHEN agg.impression_count > 0
       THEN CAST(agg.click_count AS DOUBLE) / CAST(agg.impression_count AS DOUBLE)
       ELSE 0.0
  END AS ctr
FROM (
  SELECT
    window(i.event_time, '1 minute') AS w,
    COALESCE(i.device_type, 'Unknown') AS device_type,
    COUNT(DISTINCT i.impression_id) AS impression_count,
    COUNT(DISTINCT c.click_id)      AS click_count
  FROM impressions i
  LEFT JOIN clicks c
    ON i.impression_id = c.impression_id
   AND c.click_time BETWEEN i.event_time
                        AND i.event_time + INTERVAL 10 MINUTES
  GROUP BY window(i.event_time, '1 minute'), COALESCE(i.device_type, 'Unknown')
) agg
