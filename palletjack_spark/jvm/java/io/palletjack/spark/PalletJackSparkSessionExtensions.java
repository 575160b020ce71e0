package io.palletjack.spark;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * Entry point for {@code spark.sql.extensions=
 * io.palletjack.spark.PalletJackSparkSessionExtensions}: injects
 * {@link PalletJackFilePruneRule} into the optimizer so every session —
 * including pure spark-sql / JDBC clients with no Python on the
 * classpath — gets metadata-index file pruning on registered roots
 * (SURVEY §4's named production deployment vehicle; the Python
 * index/routing.py DataFrame-layer interception remains the fallback
 * where the jar is absent).
 */
public class PalletJackSparkSessionExtensions
        extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

    public static class Builder extends AbstractFunction1<SparkSession, Rule<LogicalPlan>> {
        @Override
        public Rule<LogicalPlan> apply(SparkSession session) {
            return new PalletJackFilePruneRule(session);
        }
    }

    @Override
    public BoxedUnit apply(SparkSessionExtensions extensions) {
        extensions.injectOptimizerRule(new Builder());
        return BoxedUnit.UNIT;
    }
}
