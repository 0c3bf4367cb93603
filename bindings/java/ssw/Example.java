package ssw;

/**
 * Smoke-test main mirroring the reference's ssw.Example
 * (ref: src/ssw/Example.java:10-39).
 *
 * Build/run from bindings/java:
 *   javac ssw/*.java
 *   java -Dssw.python=python3 ssw.Example
 */
public class Example {
    public static void main(String[] args) {
        int match = 2, mismatch = 2;
        int[][] matrix = new int[128][128];
        for (char i : "ACGT".toCharArray()) {
            for (char j : "ACGT".toCharArray()) {
                matrix[i][j] = i == j ? match : -mismatch;
            }
        }
        String read = "CTGAGCCGGTAAATC";
        String ref = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA";
        Alignment aln = Aligner.align(read.getBytes(), ref.getBytes(),
                matrix, 3, 1, true);
        System.out.println(aln);
        if (aln.score1 != 21) {
            System.err.println("unexpected score: " + aln.score1);
            System.exit(1);
        }
        System.out.println("ok");
    }
}
