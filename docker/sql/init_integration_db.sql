-- Seed state for the live-protocol integration suite: the binlog this
-- writes is what MaxScale's avrorouter converts into the CDC events
-- CdcLiveIntegrationSpec asserts on. Three inserts + one update + one
-- delete exercise every event_type the envelope decoder handles.
RESET MASTER;

SET GLOBAL gtid_strict_mode=ON;

CREATE USER 'graftuser'@'%' IDENTIFIED BY 'graftpwd';
GRANT ALL ON *.* TO 'graftuser'@'%' WITH GRANT OPTION;

CREATE DATABASE test;

USE test;

CREATE TABLE tests (
  id INT PRIMARY KEY,
  label VARCHAR(32),
  amount BIGINT
);

INSERT INTO tests (id, label, amount) VALUES (1, 'alpha', 100);
INSERT INTO tests (id, label, amount) VALUES (2, 'beta', 200);
INSERT INTO tests (id, label, amount) VALUES (3, 'gamma', 300);
UPDATE tests SET amount = 250 WHERE id = 2;
DELETE FROM tests WHERE id = 3;
