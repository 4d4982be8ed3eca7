#!/usr/bin/env perl
# Extract transcripts for the utterances in an id list from WSJ .dot
# files (fresh implementation of the Kaldi wsj find_transcripts.pl
# contract):
#   find_transcripts.pl dot_files.flist < utt_ids > transcripts
# .dot lines look like: "some transcript words (utt0id)".

use strict;
use warnings;

my $dot_flist = shift or die "usage: find_transcripts.pl dot-flist\n";
open(my $fh, "<", $dot_flist) or die "cannot open $dot_flist\n";
my %utt2trans;
while (my $dot = <$fh>) {
    chomp $dot;
    open(my $dfh, "<", $dot) or die "cannot open $dot\n";
    while (<$dfh>) {
        chomp;
        next unless m/^(.*)\((\S+)\)\s*$/;
        my ($trans, $utt) = ($1, lc($2));
        $trans =~ s/^\s+|\s+$//g;
        $utt2trans{$utt} = $trans;
    }
    close $dfh;
}
close $fh;

while (<STDIN>) {
    chomp;
    my $utt = lc($_);
    if (exists $utt2trans{$utt}) {
        print "$utt $utt2trans{$utt}\n";
    } else {
        print STDERR "find_transcripts.pl: no transcript for $utt\n";
    }
}
