-- Anomaly-detection job, Spark SQL dialect.
-- Re-expression of the reference's anomaly_job.sql:49-84: LAG over
-- (campaign, window-end order), then SPIKE (ctr > 2x previous) /
-- DROP (ctr < 0.5x previous) classification. First window per
-- campaign never alerts (LAG NULL filtered), matching the reference.
-- Expects view: ctr_results(window_start, window_end, campaign_id,
-- impression_count, click_count, ctr) -- the CTR job's output, i.e.
-- the topic-bus topology (anomaly_job.sql:21) as view chaining.
CREATE OR REPLACE TEMPORARY VIEW ctr_with_previous AS
SELECT
  window_end AS alert_time,
  campaign_id,
  ctr AS current_ctr,
  LAG(ctr, 1) OVER (PARTITION BY campaign_id ORDER BY window_end) AS previous_ctr
FROM ctr_results;

SELECT
  alert_time,
  campaign_id,
  current_ctr,
  previous_ctr,
  CASE
    WHEN previous_ctr > 0 AND current_ctr > previous_ctr * 2.0 THEN 'SPIKE'
    WHEN current_ctr < previous_ctr * 0.5 THEN 'DROP'
  END AS alert_type
FROM ctr_with_previous
WHERE previous_ctr IS NOT NULL
  AND ((previous_ctr > 0 AND current_ctr > previous_ctr * 2.0)
       OR current_ctr < previous_ctr * 0.5)
